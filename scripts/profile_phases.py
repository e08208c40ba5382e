#!/usr/bin/env python
"""Per-phase device timings for the directinversion+p2p pipeline at several
image batch sizes on the current backend (run on the real TPU chip).

Phases (mirroring the reference cost model, SURVEY.md §6):
  encode      VAE encode (b=N images)
  invert      50 x UNet(rows=N)        cond-only DDIM inversion
  fused_edit  50 x UNet(rows=4N)       offsets+edit fused scan
  decode      VAE decode (recon+edit = 2N latents)
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import dataclasses as dc

    from pnpinversion_tpu.configs import SD14
    from pnpinversion_tpu.control.p2p import P2PControl, make_p2p_control
    from pnpinversion_tpu.inversion.ddim_inversion import ddim_invert_loop
    from pnpinversion_tpu.models.vae import image_to_latent, latent_to_image
    from pnpinversion_tpu.pipeline import SDPipeline
    from pnpinversion_tpu.sampling.p2p_forward import fused_direct_inversion_edit
    from pnpinversion_tpu.utils.tokenizer import SimpleWordTokenizer

    backend = jax.default_backend()
    dtype = jnp.bfloat16 if backend != "cpu" else jnp.float32
    STEPS = 50
    pipe = SDPipeline.create(SD14, rng=jax.random.PRNGKey(0),
                             num_ddim_steps=STEPS, dtype=dtype)
    sched, ucfg, vcfg = pipe.schedule, pipe.config.unet, pipe.config.vae

    ctrl, tensors1 = make_p2p_control(
        ["a round cake on a plate", "a square cake on a plate"], pipe.tokenizer,
        num_steps=STEPS, cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=True,
        blend_words=(("cake",), ("cake",)),
        eq_params={"words": ("square",), "values": (2.0,)},
        num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
        latent_size=pipe.latent_size)
    control = P2PControl(dc.replace(ctrl.spec, cond_groups=2, edit_group=1))
    cond1 = pipe.encode_prompt(["a round cake on a plate", "a square cake on a plate"])
    uncond = pipe.encode_prompt(["", ""])
    g = jnp.asarray(7.5, dtype)

    def one_image(params, image_u8, cond, tensors):
        latent = image_to_latent(params["vae"], image_u8, vcfg, dtype=dtype)
        traj = ddim_invert_loop(params["unet"], sched, latent, cond[:1], ucfg)
        row_mask = jnp.array([1.0, 0.0], dtype)
        gate = jnp.ones((STEPS,), dtype)
        edit = fused_direct_inversion_edit(
            params["unet"], sched, ucfg, traj, cond, uncond, g, control,
            tensors, row_mask, gate)
        recon = latent_to_image(params["vae"], traj[0], vcfg)[0]
        edit_img = latent_to_image(params["vae"], edit[-1:], vcfg)[0]
        return recon, edit_img

    # phase-split versions for timing
    enc = jax.jit(jax.vmap(
        lambda p, img: image_to_latent(p, img, vcfg, dtype=dtype)[0],
        in_axes=(None, 0)))
    inv = jax.jit(jax.vmap(
        lambda p, lat, c: ddim_invert_loop(p, sched, lat[None], c[:1], ucfg),
        in_axes=(None, 0, 0)))
    def _fused(p, traj, c, t):
        row_mask = jnp.array([1.0, 0.0], dtype)
        gate = jnp.ones((STEPS,), dtype)
        return fused_direct_inversion_edit(p, sched, ucfg, traj, c, uncond, g,
                                           control, t, row_mask, gate)
    fused = jax.jit(jax.vmap(_fused, in_axes=(None, 0, 0, 0)))
    dec = jax.jit(jax.vmap(
        lambda p, z: latent_to_image(p, z, vcfg)[0], in_axes=(None, 0)))
    full = jax.jit(jax.vmap(one_image, in_axes=(None, 0, 0, 0)))

    rng = np.random.RandomState(1234)
    results = {}
    for N in (1, 2, 4):
        imgs = jnp.asarray((rng.rand(N, 512, 512, 3) * 255).astype(np.uint8))
        cond = jnp.broadcast_to(cond1, (N,) + cond1.shape)
        tN = jax.tree.map(lambda x: jnp.broadcast_to(x, (N,) + x.shape), tensors1)

        def timeit(f, *a, reps=3):
            out = f(*a)  # compile
            jax.block_until_ready(out)
            t0 = time.perf_counter()
            for _ in range(reps):
                out = f(*a)
                jax.block_until_ready(out)
            return (time.perf_counter() - t0) / reps, out

        t_enc, lat = timeit(enc, pipe.params["vae"], imgs)
        t_inv, traj = timeit(inv, pipe.params["unet"], lat, cond)
        t_fus, edit = timeit(fused, pipe.params["unet"], traj, cond, tN)
        z2 = jnp.concatenate([traj[:, 0], edit[:, -1:]], axis=1)
        t_dec, _ = timeit(dec, pipe.params["vae"], z2.reshape((2 * N, 1) + z2.shape[2:]))
        t_full, _ = timeit(full, pipe.params, imgs, cond, tN)
        results[N] = {
            "encode": t_enc, "invert": t_inv, "fused_edit": t_fus,
            "decode": t_dec, "sum": t_enc + t_inv + t_fus + t_dec,
            "full_pipeline": t_full, "s_per_image": t_full / N,
        }
        print(json.dumps({"batch": N, **{k: round(v, 4) for k, v in results[N].items()}}))


if __name__ == "__main__":
    main()
