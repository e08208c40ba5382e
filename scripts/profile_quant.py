#!/usr/bin/env python
"""Device-time comparison of the fused directinversion+p2p scan with the
stock bf16 params vs the opt-in weight-only int8 params (ops/quant.py),
with and without 3x3-conv coverage. Prints per-op-type aggregates from
xprof for each."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from _xprof import traced_device_op_aggregate

TRACE_DIR = "/tmp/quant_trace"


def main():
    from pnpinversion_tpu.configs import SD14
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.ops.quant import quantize_unet_dots
    from pnpinversion_tpu.pipeline import SDPipeline

    dtype = jnp.bfloat16
    pipe = SDPipeline.create(SD14, rng=jax.random.PRNGKey(0),
                             num_ddim_steps=50, dtype=dtype)
    editor = P2PEditor(pipe)
    rng = np.random.RandomState(1234)
    img = jnp.asarray((rng.rand(512, 512, 3) * 255).astype(np.uint8))
    prompts = ["a round cake on a plate", "a square cake on a plate"]
    latent = editor._encode_image(pipe.params["vae"], img)
    cond, uncond = editor._embeds(prompts)
    traj = editor._invert(pipe.params["unet"], latent, cond[:1])
    spec, tensors = editor._make_control(prompts, 0.4, 0.6,
                                         (("cake",), ("cake",)),
                                         {"words": ("square",), "values": (2.0,)},
                                         False)
    g = jnp.asarray(7.5, dtype)
    fused = editor._fused_direct(spec)
    wdots = jax.jit(quantize_unet_dots)(pipe.params["unet"])
    wall = jax.jit(lambda u: quantize_unet_dots(u, convs=True))(pipe.params["unet"])

    for tag, unet in [("bf16", pipe.params["unet"]),
                      ("w8 dots+1x1 only", wdots),
                      ("w8 all (incl 3x3 convs)", wall)]:
        agg = traced_device_op_aggregate(
            fused, (unet, traj, cond, uncond, g, tensors), TRACE_DIR)
        tot = sum(agg.values())
        print(f"\n== {tag}: total device {tot/1e3:.1f} ms ==")
        for t, us in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
            print(f"  {t:28s} {us/1e3:8.1f} ms")


if __name__ == "__main__":
    main()
