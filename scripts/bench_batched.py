#!/usr/bin/env python
"""Probe: effective s/image of BatchedDirectInversionP2P at several
per-chip batch sizes on the current backend. Prints one JSON line per
batch size. Used to pick the batch the headline bench reports
(VERDICT r1 next-step 3a).
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()

    if jax.default_backend() == "cpu":
        # TPU: a persistent-cache hit ships the >100MB executable back
        # through the tunnel — slower than the server-side remote compile
        # (docs/PERFORMANCE.md timing pitfalls)
        cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pnpinversion_tpu.configs import SD14
    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.parallel.sweep import BatchedDirectInversionP2P, make_dp_mesh
    from pnpinversion_tpu.pipeline import SDPipeline

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend != "cpu" else jnp.float32
    pipe = SDPipeline.create(SD14, rng=jax.random.PRNGKey(0),
                             num_ddim_steps=args.steps, dtype=dtype)
    mesh = make_dp_mesh(1)
    sweep = BatchedDirectInversionP2P(pipe, mesh)

    src = "a round cake with orange frosting on a wooden plate"
    tar = "a square cake with orange frosting on a wooden plate"
    ctrl, tensors = make_p2p_control(
        [src, tar], pipe.tokenizer, num_steps=pipe.schedule.num_steps,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=False,
        blend_words=((("cake",), ("cake",))),
        eq_params={"words": ("square",), "values": (2,)},
        num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
        latent_size=pipe.latent_size)
    uncond = pipe.encode_prompt(["", ""])
    cond1 = np.asarray(pipe.encode_prompt([src, tar]))

    rng = np.random.RandomState(1234)
    for n in args.batches:
        cond = jnp.asarray(np.stack([cond1] * n))
        tb = jax.tree.map(lambda x: jnp.stack([x] * n), tensors)

        def fresh():
            # fresh pixels every dispatch: the tunnel elides repeated
            # identical dispatches (docs/PERFORMANCE.md timing pitfalls)
            return jnp.asarray((rng.rand(n, 512, 512, 3) * 255).astype(np.uint8))

        # timed regions round-trip real bytes to host: block_until_ready on
        # the tunneled backend acked the r4 w8 dispatch without completing
        # it even with fresh inputs (BENCH_r04 incident, VERDICT r4 weak #1).
        # Reduce on device first so the readback is 4 bytes, not the image
        # set through the ~20 MB/s dev tunnel (see bench.fetch).
        fetch = lambda t: [np.asarray(jnp.sum(jnp.asarray(l, jnp.float32)))
                           for l in jax.tree.leaves(t)]

        # warmup/compile
        print(f"# batch {n}: compiling...", file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        fetch(sweep.edit_batch(ctrl.spec, fresh(), cond, uncond, 7.5, tb))
        print(f"# batch {n}: compile+warm {time.perf_counter() - t0:.0f}s",
              file=sys.stderr, flush=True)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            fetch(sweep.edit_batch(ctrl.spec, fresh(), cond, uncond, 7.5, tb))
        dt = (time.perf_counter() - t0) / args.iters
        print(json.dumps({"batch": n, "s_per_batch": round(dt, 4),
                          "s_per_image": round(dt / n, 4),
                          "backend": backend}), flush=True)


if __name__ == "__main__":
    main()
