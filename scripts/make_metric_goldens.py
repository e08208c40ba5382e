#!/usr/bin/env python
"""Generate tests/goldens/metrics.json — pinned metric values (VERDICT r2 #8).

The CLIPScore/LPIPS/SSIM/DINO oracles in the test suite are live
re-implementations (transformers / an in-repo torch transcription), so a
refactor that drifts our calculator AND the oracle in tandem would pass
silently. This script freezes the calculator's outputs on fixed seeded
inputs into a committed JSON; tests/test_metric_goldens.py asserts them.

Regenerate ONLY when a deliberate numerics change lands (and say why in the
commit): JAX_PLATFORMS=cpu python scripts/make_metric_goldens.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "goldens", "metrics.json")


def compute_goldens():
    """Shared with the test: every (metric, value) on the fixed inputs."""
    import numpy as np
    from PIL import Image

    from pnpinversion_tpu.evaluation.calculator import MetricsCalculator
    from pnpinversion_tpu.evaluation.evaluate import calculate_metric

    calc = MetricsCalculator(tiny=True)  # PRNGKey(0)-seeded tiny towers
    rng = np.random.RandomState(2024)
    src = Image.fromarray((rng.rand(512, 512, 3) * 255).astype(np.uint8))
    tgt = Image.fromarray(
        (np.clip(np.asarray(src) / 255.0 + rng.randn(512, 512, 3) * 0.08, 0, 1)
         * 255).astype(np.uint8))
    mask = np.zeros((512, 512, 3))
    mask[128:384, 160:352] = 1
    src_prompt = "a cat sitting on a wooden table"
    tgt_prompt = "a dog sitting on a wooden table"

    metrics = [
        "structure_distance", "psnr", "lpips", "mse", "ssim",
        "psnr_unedit_part", "lpips_unedit_part", "mse_unedit_part",
        "ssim_unedit_part", "structure_distance_unedit_part",
        "psnr_edit_part", "lpips_edit_part", "mse_edit_part", "ssim_edit_part",
        "clip_similarity_source_image", "clip_similarity_target_image",
        "clip_similarity_target_image_edit_part",
    ]
    vals = {m: float(calculate_metric(calc, m, src, tgt, mask, mask,
                                      src_prompt, tgt_prompt))
            for m in metrics}

    # CLIPScore clamps max(100*cos, 0) per the reference; the random tiny
    # towers land negative, so the clamped metric pins 0 — also pin the RAW
    # cosine so CLIP tower numerics are actually covered
    import jax.numpy as jnp

    def raw_clip(img, txt):
        img01 = jnp.asarray(np.array(img).astype(np.float32) / 255.0)
        ie = calc._clip_image_features(img01)
        te = calc._clip_text_features(txt)
        return float(100.0 * jnp.sum(ie * te)
                     / (jnp.linalg.norm(ie) * jnp.linalg.norm(te)))

    vals["raw_clip_cos_source"] = raw_clip(src, src_prompt)
    vals["raw_clip_cos_target"] = raw_clip(tgt, tgt_prompt)
    return vals


def main():
    vals = compute_goldens()
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as f:
        json.dump(vals, f, indent=2, sort_keys=True)
    print(f"wrote {OUT}")
    for k, v in sorted(vals.items()):
        print(f"  {k}: {v:.6g}")


if __name__ == "__main__":
    main()
