#!/usr/bin/env python
"""Flash-attention block tuning on the real chip, at the exact shapes the
fused directinversion+p2p scan runs. Prints JSON lines.

Batch rows: the batch-4-per-chip production sweep runs the edit scan at
b = 3 rows x 4 images = 12 (plus b=4 in the inversion phase); --rows
selects which to tune (VERDICT r4 #2 asks for the 12-row point).

Timing: ONE dispatch of a lax.scan over ``iters`` DISTINCT (q, k, v) sets —
per docs/PERFORMANCE.md the tunnel elides repeated identical dispatches, so
per-call timing loops over the same buffers (the r3 version of this script)
cannot be trusted.
"""
import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def scan_timer(fn, qkv_stack, iters):
    """One dispatch: scan fn over iters distinct input sets; returns s/iter.

    The warmup compile runs on a PERTURBED copy of the stack (the tunnel
    elides a repeated identical dispatch — warm+time on the same buffers
    read 1000x too fast, the r4 bench incident), and the timed region
    round-trips real bytes to host rather than trusting block_until_ready.
    """
    import numpy as np

    @jax.jit
    def run(stack):
        def body(_, qkv):
            q, k, v = qkv
            return 0, fn(q, k, v)
        _, outs = jax.lax.scan(body, 0, stack)
        # reduce on device so the timed fetch is one small buffer, not the
        # full (iters, b, h, s, d) output tensor
        return jnp.mean(outs.astype(jnp.float32))

    jax.block_until_ready(run(qkv_stack + 1.0))  # compile + warm, distinct
    t0 = time.perf_counter()
    val = float(np.asarray(run(qkv_stack)))
    dt = (time.perf_counter() - t0) / iters
    assert val == val, "nan"
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=12,
                    help="attention batch rows (3 UNet rows x images/chip)")
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--bwd", action="store_true",
                    help="tune the two backward kernels (dq + dkv) instead: "
                         "grad-through-UNet paths (null-text, pix2pix-zero) "
                         "spend ~2/3 of their attention time there. Forward "
                         "blocks stay at the tuned defaults; rows=1 is the "
                         "null-text inner-Adam shape.")
    args = ap.parse_args()

    from pnpinversion_tpu.ops.flash_attention import flash_attention

    b = args.rows
    for (s, d) in ((4096, 40), (1024, 80)):
        ks = iter(jax.random.split(jax.random.PRNGKey(0), 3 * args.iters))
        stack = tuple(
            jnp.stack([jax.random.normal(next(ks), (b, 8, s, d), jnp.bfloat16)
                       for _ in range(args.iters)])
            for _ in range(3))
        stack = jnp.stack(stack, axis=1)  # (iters, 3, b, 8, s, d)
        scale = d ** -0.5
        # correctness vs einsum reference once per shape, on a 1-row slice
        # (the full-batch probs tensor is b*8*s*s — up to 13 GB at b=12)
        from pnpinversion_tpu.ops.attention import apply_probs, attention_probs
        q0, k0, v0 = stack[0, :, :1]
        ref = apply_probs(attention_probs(q0, k0, scale), v0)
        for bq, bk in itertools.product((256, 512, 1024, 2048),
                                        (512, 1024, 2048, 4096)):
            if bq > s or bk > s:
                continue
            try:
                if args.bwd:
                    def f(q, k, v, bq=bq, bk=bk):
                        def loss(q, k, v):
                            out = flash_attention(q, k, v, scale,
                                                  bwd_block_q=bq,
                                                  bwd_block_k=bk)
                            return jnp.sum(out.astype(jnp.float32))
                        dq_, dk_, dv_ = jax.grad(loss, argnums=(0, 1, 2))(
                            q, k, v)
                        return dq_ + dk_ + dv_
                else:
                    f = lambda q, k, v, bq=bq, bk=bk: flash_attention(
                        q, k, v, scale, block_q=bq, block_k=bk)
                sec = scan_timer(f, stack, args.iters)
                if args.bwd:
                    err = -1.0  # grad parity is pinned by the CPU suite
                else:
                    got = jax.jit(f)(q0, k0, v0)
                    err = float(jnp.max(jnp.abs(got.astype(jnp.float32)
                                                - ref.astype(jnp.float32))))
                # true (unpadded) attention flops: fwd 2 matmuls of
                # 2*s*s*d each; bwd adds 5 more (dq:2, dkv:3, p recompute
                # shared) -> 2.5x the fwd flops
                flops = 4 * b * 8 * s * s * d * (3.5 if args.bwd else 1)
                tfs = flops / sec / 1e12
                print(json.dumps({"rows": b, "s": s, "d": d, "bq": bq,
                                  "bk": bk, "bwd": args.bwd,
                                  "ms": round(sec * 1e3, 3),
                                  "true_tf_s": round(tfs, 1),
                                  "max_err": err}), flush=True)
            except Exception as e:  # VMEM OOM etc
                print(json.dumps({"rows": b, "s": s, "d": d, "bq": bq,
                                  "bk": bk, "bwd": args.bwd,
                                  "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
