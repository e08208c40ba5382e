#!/usr/bin/env python
"""xprof the dp-batched sweep step (the path the effective bench number and
the 700-image production sweep use) and print the device op-type breakdown.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from _xprof import device_op_aggregate, trace_once

TRACE_DIR = "/tmp/sweep_trace"


def main():
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pnpinversion_tpu.configs import SD14
    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.parallel.sweep import (
        BatchedDirectInversionP2P,
        make_dp_mesh,
    )
    from pnpinversion_tpu.pipeline import SDPipeline

    nb = int(os.environ.get("PNPI_BENCH_BATCH", "2"))
    pipe = SDPipeline.create(SD14, rng=jax.random.PRNGKey(0),
                             num_ddim_steps=50, dtype=jnp.bfloat16)
    sweep = BatchedDirectInversionP2P(pipe, make_dp_mesh(1))
    rng = np.random.RandomState(1234)
    img = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
    src = "a round cake with orange frosting on a wooden plate"
    tar = "a square cake with orange frosting on a wooden plate"
    ctrl, tensors1 = make_p2p_control(
        [src, tar], pipe.tokenizer, num_steps=50,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=False, blend_words=(("cake",), ("cake",)),
        eq_params={"words": ("square",), "values": (2,)},
        num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
        latent_size=pipe.latent_size)
    imgs_b = jnp.asarray(np.stack([img] * nb))
    cond_b = jnp.asarray(np.stack([np.asarray(pipe.encode_prompt([src, tar]))] * nb))
    tens_b = jax.tree.map(lambda x: jnp.stack([x] * nb), tensors1)
    uncond2 = pipe.encode_prompt(["", ""])
    args = (ctrl.spec, imgs_b, cond_b, uncond2, 7.5, tens_b)
    trace_once(sweep.edit_batch, args, TRACE_DIR)
    agg = device_op_aggregate(TRACE_DIR)
    tot = sum(agg.values())
    print(f"batch={nb} device total: {tot/1e3:.0f}ms "
          f"({tot/1e3/nb:.0f}ms/image)")
    for k, val in sorted(agg.items(), key=lambda kv: -kv[1])[:12]:
        print(f"  {val/1e3:7.1f}ms {val/tot*100:5.1f}% {k}")


if __name__ == "__main__":
    main()
