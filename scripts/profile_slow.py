#!/usr/bin/env python
"""Device profiles of the two slow families (VERDICT r4 #6).

Per family, traces ONE dispatch of the dominant phase on the real chip and
prints (a) the xprof device-op aggregate, (b) cost_analysis FLOPs →
effective UNet-row count (reveals the average early-stop trip count of the
inner Adam `lax.while_loop`s), (c) total device seconds.

  null-text   null_text_optimization: 50 outer steps x (1 cond row +
              <=10 inner fwd+bwd rows + 1 uncond advance row)
              (reference: models/p2p/inversion.py:196-225)
  stylediff   train_mappers: 50 outer x (1 uncond row + ceil(100*e^{-0.1 i})
              inner fwd+bwd rows + b=2 advance)
              (reference: models/stylediffusion/inversion.py:157-232)

Usage: python scripts/profile_slow.py [nulltext|stylediff|both]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

from _flops import fn_flops
from _xprof import device_op_aggregate, trace_once

# one b=1 512px UNet forward, analytic (scripts/_flops.py over ddim_invert/50)
UNET_ROW_TF = 0.348
V5E_BF16_PEAK_TF = 197.0


def report(name, fn, call_args, agg):
    """Print analytic static + per-trip while-body TF against the trace's
    device time. For the early-stopped inner Adam loops the interesting
    number is the implied average trip count: what device time is left
    after the static work at the observed rate, divided by per-trip TF."""
    fl = fn_flops(fn, *call_args)
    static_tf = fl["static_tf"]
    whiles = fl["while_bodies_tf"]
    total_s = sum(agg.values()) / 1e6
    print(f"\n== {name} ==")
    print(f"analytic static: {static_tf:.2f} TF "
          f"≈ {static_tf / UNET_ROW_TF:.0f} UNet-row equivalents; "
          f"{len(whiles)} while bodies, "
          f"{sum(whiles):.2f} TF/trip total")
    out = {"static_tf": round(static_tf, 2),
           "while_bodies_tf_per_trip": [round(w, 3) for w in whiles],
           "device_s": round(total_s, 3)}
    if total_s:
        rate_tf_s = None
        for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:10]:
            print(f"  {v / 1e3:9.1f} ms  {k}")
        # assume the whole program runs at the flagship fused-scan rate
        # (~34% MFU) to split device time into static vs while work
        rate_tf_s = 0.34 * V5E_BF16_PEAK_TF
        static_s = static_tf / rate_tf_s
        while_s = max(0.0, total_s - static_s)
        if whiles:
            trips = while_s * rate_tf_s / sum(whiles)
            print(f"device time: {total_s:.3f} s; at ~{rate_tf_s:.0f} TF/s "
                  f"static ≈ {static_s:.2f} s → while ≈ {while_s:.2f} s "
                  f"≈ {trips:.1f} avg trips/outer-loop-total")
            out["implied_avg_trips_total"] = round(trips, 1)
        else:
            print(f"device time: {total_s:.3f} s "
                  f"({static_tf / total_s:.0f} TF/s, "
                  f"{100 * static_tf / total_s / V5E_BF16_PEAK_TF:.1f}% MFU)")
    out["pools_ms"] = {k: round(v / 1e3, 1) for k, v in
                       sorted(agg.items(), key=lambda kv: -kv[1])[:8]}
    return out


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    from pnpinversion_tpu.configs import SD14, TINY
    from pnpinversion_tpu.pipeline import SDPipeline

    cfg = SD14 if jax.default_backend() != "cpu" else TINY
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    pipe = SDPipeline.create(cfg, rng=jax.random.PRNGKey(0),
                             num_ddim_steps=50, dtype=dtype)
    rng = np.random.RandomState(7)
    res = cfg.image_size
    img = jnp.asarray((rng.rand(res, res, 3) * 255).astype(np.uint8))
    src = "a round cake with orange frosting on a wooden plate"
    out = {}

    if which in ("nulltext", "both"):
        from pnpinversion_tpu.editors.p2p_editor import P2PEditor
        ed = P2PEditor(pipe)
        latent = ed._encode_image(pipe.params["vae"], img)
        cond1 = pipe.encode_prompt([src])
        uncond1 = pipe.encode_prompt([""])
        traj = ed._invert(pipe.params["unet"], latent, cond1)
        g = jnp.asarray(7.5, dtype)
        fn = ed._null_text(10)
        args = (pipe.params["unet"], traj, uncond1, cond1, g)
        agg = device_op_aggregate(trace_once(fn, args, "/tmp/slow_nt"))
        out["null_text_optimization"] = report("null-text optimization",
                                               fn, args, agg)

    if which in ("stylediff", "both"):
        from pnpinversion_tpu.editors.stylediffusion_editor import (
            StyleDiffusionEditor,
        )
        from pnpinversion_tpu.models import vit

        if cfg is TINY:  # CPU plumbing smoke: match the text width
            tiny_clip = vit.ViTConfig(image_size=16, patch_size=8, width=32,
                                      layers=2, heads=2)
            sed = StyleDiffusionEditor(pipe, clip_vision_cfg=tiny_clip)
        else:
            sed = StyleDiffusionEditor(pipe)
        from pnpinversion_tpu.inversion.stylediffusion import (
            ddim_invert_with_maps,
            train_mappers,
        )
        from pnpinversion_tpu.models.stylediffusion import (
            init_mapper_params,
            mapper_at_step,
        )
        latent = sed._jit("enc", lambda: jax.jit(
            lambda p, im: __import__("pnpinversion_tpu.models.vae",
                                     fromlist=["image_to_latent"])
            .image_to_latent(p, im, pipe.config.vae, dtype=pipe.dtype)))(
            pipe.params["vae"], img)
        cond1 = pipe.encode_prompt([src])
        uncond1 = pipe.encode_prompt([""])
        img_tokens = sed._img_tokens(np.asarray(img))
        inv = jax.jit(lambda p, lat, emb: ddim_invert_with_maps(
            p, pipe.schedule, lat, emb, pipe.config.unet, pipe.num_lb_slots))
        inv_args = (pipe.params["unet"], latent, cond1)
        agg = device_op_aggregate(trace_once(inv, inv_args, "/tmp/slow_sdinv"))
        out["sd_invert_with_maps"] = report("stylediffusion invert+maps",
                                            inv, inv_args, agg)
        traj, gt_maps = inv(*inv_args)
        n_tokens = (sed.clip_cfg.image_size // sed.clip_cfg.patch_size) ** 2 + 1
        mapper0 = mapper_at_step(
            init_mapper_params(jax.random.PRNGKey(0), 1, tokens_in=n_tokens,
                               width=sed.clip_cfg.width), 0)
        g = jnp.asarray(7.5, dtype)
        tr = jax.jit(lambda p, t2, gm, it, u, c, g2, m0: train_mappers(
            p, pipe.schedule, t2, gm, it, u, c, g2, m0, pipe.config.unet,
            num_inner_steps=100))
        tr_args = (pipe.params["unet"], traj, gt_maps, img_tokens,
                   uncond1, cond1, g, mapper0)
        agg = device_op_aggregate(trace_once(tr, tr_args, "/tmp/slow_sdtr"))
        out["sd_train_mappers"] = report("stylediffusion train_mappers",
                                         tr, tr_args, agg)

    print("\n" + json.dumps(out))


if __name__ == "__main__":
    main()
