#!/usr/bin/env python
"""xprof-derived MFU for the flagship fused directinversion+p2p scan.

MFU = (analytic jaxpr FLOPs of ONE fused-scan dispatch, scripts/_flops.py)
      / (xprof device self-time of that dispatch)
      / (v5e bf16 peak, 197 TF/s).

XLA's cost_analysis is NOT usable here: it counts a lax.scan body once
(not x50) and pallas flash calls as zero — it read 2.7 TF for a program
whose true MXU work is ~51 TF. _flops.count_flops walks the jaxpr with
scan lengths applied and the analytic 4*B*H*Sq*Sk*D flash formula.

Two figures are printed:
  - MXU-time MFU: FLOPs over dot/conv/flash device time only (how close
    the counted work is to its roofline),
  - end-to-end MFU: all device time in the denominator (what fraction of
    the chip's peak the whole scan sustains — the headline figure for
    docs/PERFORMANCE.md).

Run on the real chip: `python scripts/mfu.py [--batch N]`.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

# JAX_PLATFORMS=cpu alone does NOT stop this box's axon plugin from
# initializing the tunneled-TPU backend (it hangs when the tunnel is down);
# only the jax_platforms *config* does (same trick as tests/conftest.py).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp
import numpy as np

V5E_BF16_PEAK = 197e12
TRACE_DIR = "/tmp/mfu_trace"
# xprof op pools that hold the counted FLOPs (flash attention runs as
# pallas_call; its true flops are in the numerator so its time must be in
# the denominator). Exact prefixes — a bare "conv" substring would also
# catch convert_element_type.
MXU_TYPES = ("dot_general", "conv_general_dilated", "pallas_call",
             "convolution", "dot(")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1,
                    help="images per fused-scan dispatch (sweep batched path)")
    ap.add_argument("--config", default="SD14", choices=("SD14", "TINY"),
                    help="TINY: CPU smoke test of this script's plumbing")
    ap.add_argument("--steps", type=int, default=50)
    args = ap.parse_args()

    import pnpinversion_tpu.configs as configs
    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.parallel.sweep import (
        BatchedDirectInversionP2P,
        make_dp_mesh,
    )
    from pnpinversion_tpu.pipeline import SDPipeline

    cfg = getattr(configs, args.config)
    res = cfg.image_size
    dtype = jnp.bfloat16 if jax.default_backend() != "cpu" else jnp.float32
    pipe = SDPipeline.create(cfg, rng=jax.random.PRNGKey(0),
                             num_ddim_steps=args.steps, dtype=dtype)
    editor = P2PEditor(pipe)
    rng = np.random.RandomState(1234)
    src = "a round cake with orange frosting on a wooden plate"
    tar = "a square cake with orange frosting on a wooden plate"

    if args.batch == 1:
        # fused offsets+edit scan only (the 1.6 s of the 2.26 s headline)
        img = jnp.asarray((rng.rand(res, res, 3) * 255).astype(np.uint8))
        latent = editor._encode_image(pipe.params["vae"], img)
        cond, uncond = editor._embeds([src, tar])
        traj = editor._invert(pipe.params["unet"], latent, cond[:1])
        spec, tensors = editor._make_control(
            [src, tar], 0.4, 0.6, (("cake",), ("cake",)),
            {"words": ("square",), "values": (2.0,)}, False)
        g = jnp.asarray(7.5, dtype)
        fn = editor._fused_direct(spec)
        call_args = (pipe.params["unet"], traj, cond, uncond, g, tensors)
        mesh_ctx = None
    else:
        # the full per-image program bench.py times: encode + invert +
        # fused edit + decode, dp-batched (bench.py batch-4 headline path)
        nb = args.batch
        sweep = BatchedDirectInversionP2P(pipe, make_dp_mesh(1))
        ctrl, tensors1 = make_p2p_control(
            [src, tar], pipe.tokenizer, num_steps=args.steps,
            cross_replace_steps=0.4, self_replace_steps=0.6,
            is_replace_controller=False,
            blend_words=(("cake",), ("cake",)),
            eq_params={"words": ("square",), "values": (2,)},
            num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
            latent_size=pipe.latent_size)
        imgs = jnp.asarray((rng.rand(nb, res, res, 3) * 255).astype(np.uint8))
        cond_b = jnp.asarray(
            np.stack([np.asarray(pipe.encode_prompt([src, tar]))] * nb))
        tens_b = jax.tree.map(lambda x: jnp.stack([x] * nb), tensors1)
        uncond2 = jnp.asarray(pipe.encode_prompt(["", ""]))
        uncond_b = jnp.broadcast_to(uncond2[None], (nb,) + uncond2.shape)
        fn = sweep._fn(ctrl.spec)
        call_args = (pipe.params, imgs, cond_b, uncond_b,
                     jnp.asarray(7.5, dtype), tens_b)
        mesh_ctx = sweep.mesh

    import contextlib

    from _flops import fn_flops

    ctx = mesh_ctx if mesh_ctx is not None else contextlib.nullcontext()
    jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
    with ctx:
        jfn.lower(*call_args).compile()
        fl = fn_flops(jfn, *call_args)
    if fl["while_bodies_tf"]:
        print(f"note: {len(fl['while_bodies_tf'])} while bodies excluded "
              f"({[round(w, 3) for w in fl['while_bodies_tf']]} TF/trip)")
    flops = fl["static_tf"] * 1e12
    print(f"analytic flops: {flops / 1e12:.2f} TF "
          f"({flops / args.batch / 1e12:.3f} TF/image)")

    from _xprof import traced_device_op_aggregate
    with ctx:
        agg = traced_device_op_aggregate(jfn, call_args, TRACE_DIR)
    total_us = sum(agg.values())
    mxu_us = sum(v for k, v in agg.items()
                 if any(t in k.lower() for t in MXU_TYPES))
    if total_us == 0:
        print("no Device rows in the trace (CPU backend?) — plumbing OK, "
              "run on the real chip for the MFU figure")
        return
    print(f"device time: total {total_us / 1e6:.3f} s, "
          f"MXU ops {mxu_us / 1e6:.3f} s ({100 * mxu_us / total_us:.1f}%)")
    e2e = flops / (total_us * 1e-6) / V5E_BF16_PEAK
    mxu = flops / (mxu_us * 1e-6) / V5E_BF16_PEAK if mxu_us else float("nan")
    print(f"end-to-end MFU: {100 * e2e:.1f}% of v5e bf16 peak")
    print(f"MXU-time MFU:   {100 * mxu:.1f}% "
          f"(matmul/conv/flash pools only in the denominator)")
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:12]
    for k, v in top:
        print(f"  {v / 1e3:9.1f} ms  {k}")


if __name__ == "__main__":
    main()
