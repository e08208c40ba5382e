#!/usr/bin/env python
"""Per-phase device timing of the flagship directinversion+p2p pipeline plus
micro-benchmarks of the UNet step and attention sites. Guides kernel work
(r1 VERDICT next-step 3b). Prints one JSON line per measurement.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *args, iters=3, warmup=1):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pnpinversion_tpu.configs import SD14
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.pipeline import SDPipeline

    dtype = jnp.bfloat16
    STEPS = 50
    pipe = SDPipeline.create(SD14, rng=jax.random.PRNGKey(0),
                             num_ddim_steps=STEPS, dtype=dtype)
    editor = P2PEditor(pipe)
    rng = np.random.RandomState(1234)
    img = jnp.asarray((rng.rand(512, 512, 3) * 255).astype(np.uint8))
    src = "a round cake with orange frosting on a wooden plate"
    tar = "a square cake with orange frosting on a wooden plate"
    prompts = [src, tar]
    g = jnp.asarray(7.5, dtype)

    def rep(name, secs, **kw):
        print(json.dumps({"phase": name, "ms": round(secs * 1e3, 2), **kw}),
              flush=True)

    # ---- phases
    enc = editor._encode_image
    latent = enc(pipe.params["vae"], img)
    rep("vae_encode", timed(enc, pipe.params["vae"], img))

    cond, uncond = editor._embeds(prompts)
    traj = editor._invert(pipe.params["unet"], latent, cond[:1])
    rep("invert_50xb1", timed(editor._invert, pipe.params["unet"], latent,
                              cond[:1], iters=1))

    spec, tensors = editor._make_control(prompts, 0.4, 0.6,
                                         (("cake",), ("cake",)),
                                         {"words": ("square",), "values": (2.0,)},
                                         False)
    fused = editor._fused_direct(spec)
    rep("fused_srcfree", timed(fused, pipe.params["unet"], traj, cond, uncond, g,
                               tensors, iters=1))

    dec = editor._decode_image
    rep("vae_decode", timed(dec, pipe.params["vae"], traj[0]))

    t0 = time.perf_counter()
    editor._embeds(["a dog", "a cat"])
    rep("clip_embeds_host", time.perf_counter() - t0)

    # ---- UNet single-step micro
    from pnpinversion_tpu.control.base import NO_CONTROL
    from pnpinversion_tpu.models.unet import unet_apply

    ucfg = pipe.config.unet
    for b in (1, 2, 4, 8):
        x = jnp.zeros((b, 64, 64, 4), dtype)
        ctx = jnp.zeros((b, 77, 768), dtype)

        @jax.jit
        def step(p, x, ctx):
            eps, _ = unet_apply(p, x, jnp.asarray(500), ctx, ucfg)
            return eps

        ms = timed(step, pipe.params["unet"], x, ctx, iters=5)
        rep(f"unet_b{b}", ms)

    # ---- attention micro at the 64^2 site
    from pnpinversion_tpu.ops.attention import attention_probs, apply_probs
    from pnpinversion_tpu.ops.flash_attention import flash_attention

    for (bh, s, d) in ((8, 4096, 40), (8, 1024, 80), (8, 256, 160)):
        q = jax.random.normal(jax.random.PRNGKey(1), (8, bh, s, d), dtype)
        k = jax.random.normal(jax.random.PRNGKey(2), (8, bh, s, d), dtype)
        v = jax.random.normal(jax.random.PRNGKey(3), (8, bh, s, d), dtype)
        scale = d ** -0.5
        f = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))
        e = jax.jit(lambda q, k, v: apply_probs(attention_probs(q, k, scale), v))
        rep(f"flash_b8_s{s}_d{d}", timed(f, q, k, v, iters=5))
        rep(f"einsum_b8_s{s}_d{d}", timed(e, q, k, v, iters=5))


if __name__ == "__main__":
    main()
