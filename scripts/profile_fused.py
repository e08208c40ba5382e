#!/usr/bin/env python
"""Capture an xprof trace of the fused directinversion+p2p scan and print the
device op-profile (top ops by self time). Drives kernel optimization work."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

TRACE_DIR = "/tmp/fused_trace"


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pnpinversion_tpu.configs import SD14
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
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
    args = (pipe.params["unet"], traj, cond, uncond, g, tensors)
    from _xprof import tool_data, trace_once

    trace_once(fused, args, TRACE_DIR)
    for tool in ("framework_op_stats", "op_profile"):
        try:
            data = tool_data(TRACE_DIR, tool)
            out = f"/tmp/fused_{tool}.out"
            mode = "wb" if isinstance(data, bytes) else "w"
            with open(out, mode) as f:
                f.write(data)
            print("wrote", out)
        except Exception as e:
            print(tool, "failed:", repr(e)[:300])


if __name__ == "__main__":
    main()
