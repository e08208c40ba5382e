"""Microbenchmark: is int8 MXU math actually ~2x bf16 at our hot shapes?

v5e peak is 197 TF/s bf16 / 394 TOP/s int8. If XLA lowers int8
dot_general / conv_general_dilated at the doubled rate for the UNet's hot
shapes, an opt-in int8 inference path is worth building; if not, this
script is the cheap refutation.

Wall-clock through the axon tunnel is untrustworthy even for single
fresh-input dispatches (measured impossible >80 PF/s rates), so this
measures DEVICE time from an xprof trace of one 50-iteration fori_loop
dispatch per candidate (the docs/PERFORMANCE.md-sanctioned method).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax import lax

from _xprof import traced_device_op_aggregate

N_ITERS = 50
ROWS = 12  # batch rows in the batch-4 sweep's fused scan
TRACE_DIR = "/tmp/int8_trace"


def device_op_ms(fn, args, op_types):
    """Device self-time (ms) of the named op types for ONE dispatch of
    fn(*args), via the xprof framework_op_stats tool."""
    agg = traced_device_op_aggregate(fn, args, TRACE_DIR)
    return sum(us for t, us in agg.items() if t in op_types) / 1e3


def conv_fn(h, w, cin, cout, dtype):
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    x = (jnp.arange(ROWS * h * w * cin, dtype=jnp.float32) % 7 - 3)
    x = x.reshape(ROWS, h, w, cin).astype(dtype)
    k = (jnp.arange(9 * cin * cout, dtype=jnp.float32) % 5 - 2)
    k = k.reshape(3, 3, cin, cout).astype(dtype)

    @jax.jit
    def run(x, k):
        def body(i, x):
            y = lax.conv_general_dilated(
                x, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=acc)
            return x + (y.mean(axis=-1, keepdims=True) % 3).astype(dtype)
        return lax.fori_loop(0, N_ITERS, body, x)

    flops = 2 * ROWS * h * w * cin * cout * 9 * N_ITERS
    return run, (x, k), flops


def dot_fn(m, kdim, n, dtype):
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32
    x = (jnp.arange(ROWS * m * kdim, dtype=jnp.float32) % 7 - 3)
    x = x.reshape(ROWS, m, kdim).astype(dtype)
    w = (jnp.arange(kdim * n, dtype=jnp.float32) % 5 - 2)
    w = w.reshape(kdim, n).astype(dtype)

    @jax.jit
    def run(x, w):
        def body(i, x):
            y = jnp.einsum("bmk,kn->bmn", x, w,
                           preferred_element_type=acc)
            return x + (y.mean(axis=-1, keepdims=True) % 3).astype(dtype)
        return lax.fori_loop(0, N_ITERS, body, x)

    flops = 2 * ROWS * m * kdim * n * N_ITERS
    return run, (x, w), flops


def main():
    print("device:", jax.devices()[0])
    conv_shapes = [(64, 64, 320, 320), (32, 32, 640, 640),
                   (16, 16, 1280, 1280)]
    dot_shapes = [(4096, 320, 320), (4096, 320, 2560), (4096, 2560, 320),
                  (1024, 640, 640), (1024, 640, 5120)]
    ops = ("conv_general_dilated", "dot_general", "dot", "einsum", "convolution")
    for name, shapes, mk in [("conv", conv_shapes, conv_fn),
                             ("dot", dot_shapes, dot_fn)]:
        for s in shapes:
            row = {}
            for dtype, tag in [(jnp.bfloat16, "bf16"), (jnp.int8, "int8")]:
                run, args, flops = mk(*s, dtype)
                ms = device_op_ms(run, args, ops)
                row[tag] = (ms / N_ITERS, flops / (ms / 1e3) / 1e12 if ms else 0)
            speedup = (row["bf16"][0] / row["int8"][0]) if row["int8"][0] else 0
            print(f"{name} {s}: bf16 {row['bf16'][0]:.3f} ms ({row['bf16'][1]:.0f} TF/s)"
                  f" | int8 {row['int8'][0]:.3f} ms ({row['int8'][1]:.0f} TOP/s)"
                  f" | speedup {speedup:.2f}x", flush=True)


if __name__ == "__main__":
    main()
