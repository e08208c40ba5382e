#!/usr/bin/env python
"""Sustained-throughput rehearsal (VERDICT r2 #7): a >=16-image, >=3-method
512px sweep through the real CLI plus `evaluate --sharded`, timed end-to-end
with compile warmup separated from steady state.

Produces docs/rehearsal.json:
  per method: wall_s, first_image_s (holds the remote compile),
  steady_s_per_image (median inter-image gap past the first), images_done;
  eval: wall_s, s_per_row;
  totals: end_to_end wall, steady-state-only s/image across the sweep —
  the measured basis for the v5e-8 700-image projection (replaces the
  4-image extrapolation flagged in VERDICT r2 weak #5).

Usage: python scripts/rehearsal.py [--images 16] [--methods m1 m2 m3]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from family_campaign import build_demo  # noqa: E402  (same scripts/ dir)

METHOD_GROUP = {
    "directinversion+p2p": "1", "directinversion+masactrl": "1",
    "ddim+p2p": "1", "negative-prompt-inversion+p2p": "1",
    "blended-latent-diffusion": "2", "instruct-pix2pix": "2",
    "edit-friendly-inversion+p2p": "4",
}
DEFAULT_METHODS = ["directinversion+p2p", "directinversion+masactrl",
                   "blended-latent-diffusion"]


def gaps(run_log):
    """Inter-burst gaps normalized per image (see
    family_campaign.steady_s_per_image: the pipelined saver makes saves
    bursty, one burst per device chunk)."""
    ts = []
    with open(run_log) as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("event") == "image_done":
                ts.append(rec["ts"])
    if len(ts) < 2:
        return [], len(ts)
    bursts = [[ts[0]]]
    for a, b in zip(ts, ts[1:]):
        if b - a > 1.0:
            bursts.append([])
        bursts[-1].append(b)
    if len(bursts) < 2:
        return [b - a for a, b in zip(ts, ts[1:])], len(ts)
    size = max(len(b) for b in bursts)
    return [(b2[0] - b1[0]) / size for b1, b2 in zip(bursts, bursts[1:])], len(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=16)
    ap.add_argument("--methods", nargs="+", default=DEFAULT_METHODS)
    ap.add_argument("--workdir", default="/tmp/rehearsal")
    ap.add_argument("--timeout", type=int, default=5400)
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "rehearsal.json"))
    args = ap.parse_args()

    data = os.path.join(args.workdir, "data")
    outroot = os.path.join(args.workdir, "out")
    if not os.path.exists(os.path.join(data, "mapping_file.json")):
        build_demo(data, args.images)

    report = {"images": args.images, "methods": {}}
    t_all = time.time()
    steady_total = 0.0
    for method in args.methods:
        log = os.path.join(args.workdir, f"log_{method}.jsonl")
        if os.path.exists(log):
            os.remove(log)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "runners", "run_sweep_sharded.py"),
             "--data_path", data, "--output_path", outroot,
             "--method", method, "--run_log", log],
            capture_output=True, text=True, timeout=args.timeout, cwd=REPO)
        wall = time.time() - t0
        g, n = gaps(log)
        steady = sorted(g[1:])[len(g[1:]) // 2] if len(g) > 1 else None
        rec = {"wall_s": round(wall, 1), "images_done": n, "rc": proc.returncode,
               "first_image_gap_s": round(g[0], 2) if g else None,
               "steady_s_per_image": round(steady, 3) if steady else None}
        if proc.returncode != 0:
            rec["stderr_tail"] = proc.stderr[-1500:]
        else:
            steady_total += steady * args.images if steady else wall
        report["methods"][method] = rec
        print(json.dumps({method: rec}), flush=True)

    tgt = [f"{METHOD_GROUP.get(m, '1')}_{m}" for m in args.methods
           if report["methods"][m]["rc"] == 0]
    csv_path = os.path.join(args.workdir, "rehearsal_eval.csv")
    t0 = time.time()
    cmd = [sys.executable, "-m", "pnpinversion_tpu.evaluation.evaluate",
           "--annotation_mapping_file", os.path.join(data, "mapping_file.json"),
           "--src_image_folder", os.path.join(data, "annotation_images"),
           "--output_root", outroot, "--tgt_methods", *tgt,
           "--result_path", csv_path, "--sharded"]
    for attempt in range(2):
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=args.timeout, cwd=REPO)
        if proc.returncode == 0 or "RESOURCE_EXHAUSTED" not in proc.stderr:
            break
        # the tunnel server reclaims the just-exited sweep's HBM
        # asynchronously; an immediate eval start can transiently OOM
        print("eval hit RESOURCE_EXHAUSTED; retrying in 60s", flush=True)
        time.sleep(60)
    eval_wall = time.time() - t0
    n_rows = args.images * len(tgt)
    report["eval"] = {"wall_s": round(eval_wall, 1), "rc": proc.returncode,
                      "method_image_pairs": n_rows,
                      "s_per_pair": round(eval_wall / max(n_rows, 1), 3)}
    if proc.returncode != 0:
        report["eval"]["stderr_tail"] = proc.stderr[-1500:]
    report["end_to_end_wall_s"] = round(time.time() - t_all, 1)
    report["steady_sweep_s_per_image_avg"] = round(
        steady_total / max(args.images * len(tgt), 1), 3)
    with open(args.out, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
