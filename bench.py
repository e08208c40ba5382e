#!/usr/bin/env python
"""Benchmark: full directinversion+p2p edit (50 DDIM steps, 512x512, SD1.4
architecture) on one chip. Prints ONE JSON line.

Metric: seconds of device wall-clock per edited image across the four phases
the reference runs per image (models/p2p/inversion.py:308-391 +
p2p_guidance_forward.py:135-173):
  1. DDIM inversion         — 50 x UNet(b=1)
  2. DirectInversion offsets — 50 x UNet(b=4)
  3. reconstruction forward  — 50 x UNet(b=4)
  4. controlled edit forward — 50 x UNet(b=4)
plus VAE encode/decode and CLIP prompt encoding.

vs_baseline compares against REF_A100_SECONDS, a derived estimate of the
reference PyTorch pipeline on A100 (no machine-readable number is published;
see BASELINE.md): 650 UNet sample-forwards/image at fp32 ~23ms each ≈ 15s,
plus VAE/text/Python-controller overhead ≈ 18s/image.
"""
import json
import os
import sys
import time

os.environ.setdefault("XLA_FLAGS", "")

import jax
import jax.numpy as jnp
import numpy as np

REF_A100_SECONDS = 18.0
STEPS = 50


def main():
    # persistent compile cache (first run pays ~minutes of compiles)
    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from pnpinversion_tpu.configs import SD14
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.pipeline import SDPipeline

    backend = jax.default_backend()
    on_tpu = backend not in ("cpu",)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32

    pipe = SDPipeline.create(SD14, rng=jax.random.PRNGKey(0),
                             num_ddim_steps=STEPS, dtype=dtype)
    editor = P2PEditor(pipe)

    rng = np.random.RandomState(1234)
    img = (rng.rand(512, 512, 3) * 255).astype(np.uint8)
    src = "a round cake with orange frosting on a wooden plate"
    tar = "a square cake with orange frosting on a wooden plate"
    kwargs = dict(
        guidance_scale=7.5,
        blend_word=(("cake",), ("cake",)),
        eq_params={"words": ("square",), "values": (2.0,)},
    )

    # warmup (compiles everything)
    editor("directinversion+p2p", img, src, tar, **kwargs)

    n_iters = 3 if on_tpu else 1
    t0 = time.perf_counter()
    for _ in range(n_iters):
        editor("directinversion+p2p", img, src, tar, **kwargs)
    seconds = (time.perf_counter() - t0) / n_iters

    print(json.dumps({
        "metric": "directinversion+p2p_seconds_per_image",
        "value": round(seconds, 4),
        "unit": f"s/image (50 steps, 512px, {backend}, {np.dtype(np.float32).name if dtype == jnp.float32 else 'bf16'})",
        "vs_baseline": round(REF_A100_SECONDS / seconds, 3),
    }))


if __name__ == "__main__":
    main()
