#!/usr/bin/env python
"""Flash-attention block tuning on the real chip, at the exact shapes the
fused directinversion+p2p scan runs (b=8 rows, h=8). Prints JSON lines."""
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def timed(fn, *args, iters=10):
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from pnpinversion_tpu.ops.flash_attention import flash_attention

    for (s, d) in ((4096, 40), (1024, 80)):
        q = jax.random.normal(jax.random.PRNGKey(1), (8, 8, s, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.PRNGKey(2), (8, 8, s, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.PRNGKey(3), (8, 8, s, d), jnp.bfloat16)
        scale = d ** -0.5
        # correctness vs einsum reference once per shape
        from pnpinversion_tpu.ops.attention import apply_probs, attention_probs
        ref = apply_probs(attention_probs(q, k, scale), v)
        for bq, bk in itertools.product((256, 512, 1024, 2048),
                                        (512, 1024, 2048, 4096)):
            if bq > s or bk > s:
                continue
            try:
                f = jax.jit(lambda q, k, v, bq=bq, bk=bk: flash_attention(
                    q, k, v, scale, block_q=bq, block_k=bk))
                ms = timed(f, q, k, v) * 1e3
                err = float(jnp.max(jnp.abs(f(q, k, v).astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                print(json.dumps({"s": s, "d": d, "bq": bq, "bk": bk,
                                  "ms": round(ms, 3), "max_err": err}),
                      flush=True)
            except Exception as e:  # VMEM OOM etc
                print(json.dumps({"s": s, "d": d, "bq": bq, "bk": bk,
                                  "error": str(e)[:120]}), flush=True)


if __name__ == "__main__":
    main()
