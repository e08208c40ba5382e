"""Shared xprof trace capture + framework_op_stats parsing for the
profiling scripts (profile_fused / profile_sweep / profile_quant /
microbench_int8 — previously four drifting copies of the same block).

Device time from an xprof trace is the only trustworthy timing signal on
the tunneled TPU (docs/PERFORMANCE.md "timing pitfalls")."""
import glob
import json
import os

import jax


def trace_once(fn, args, trace_dir):
    """Compile+warm fn(*args), then trace exactly ONE dispatch."""
    jax.block_until_ready(fn(*args))
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        jax.block_until_ready(fn(*args))
    return trace_dir


def tool_data(trace_dir, tool="framework_op_stats"):
    """Raw gviz output of one xprof tool over every xplane in trace_dir."""
    from xprof.convert import raw_to_tool_data

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    data, _ = raw_to_tool_data.xspace_to_tool_data(
        xplanes, tool, {"tqx": "out:csv;"})
    return data


def device_op_aggregate(trace_dir):
    """{op_type: total device self-time in us} from framework_op_stats."""
    data = tool_data(trace_dir)
    if isinstance(data, bytes):
        data = data.decode()
    table = json.loads(data)
    table = table[0] if isinstance(table, list) else table
    ids = [c["id"] for c in table["cols"]]
    agg = {}
    for row in table["rows"]:
        r = dict(zip(ids, [c.get("v") for c in row["c"]]))
        if r.get("host_or_device") != "Device":
            continue
        agg[r["type"]] = agg.get(r["type"], 0.0) + float(r["total_self_time"] or 0)
    return agg


def traced_device_op_aggregate(fn, args, trace_dir="/tmp/xprof_trace"):
    """One-call convenience: trace one dispatch of fn(*args) and aggregate."""
    trace_once(fn, args, trace_dir)
    return device_op_aggregate(trace_dir)
