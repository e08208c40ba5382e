#!/usr/bin/env python
"""Blended Latent Diffusion runner
(reference: /root/reference/run_editing_blended_latent_diffusion.py).
Uses SD2.1-base and the PIE ground-truth masks."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from pnpinversion_tpu.cli import run_benchmark, standard_argparser
from pnpinversion_tpu.configs import SD21
from pnpinversion_tpu.editors.bld_editor import BlendedLatentDiffusionEditor
from pnpinversion_tpu.pipeline import SDPipeline

IMAGE_SAVE_PATHS = {"blended-latent-diffusion": "blended-latent-diffusion"}


def main(argv=None):
    parser = standard_argparser(["blended-latent-diffusion"])
    args = parser.parse_args(argv)
    pipe = SDPipeline.create(SD21, num_ddim_steps=args.num_ddim_steps,
                             checkpoint_dir=args.checkpoint_dir,
                             quantize=getattr(args, "quant", None))
    editor = BlendedLatentDiffusionEditor(pipe)

    def edit_fn(edit_method, item):
        mask = Image.fromarray(np.uint8(item.mask)).convert("L")
        return editor(edit_method, item.image_path, mask, item.target_prompt,
                      guidance_scale=7.5, blending_percentage=0.25)

    run_benchmark(args, edit_fn, IMAGE_SAVE_PATHS)


if __name__ == "__main__":
    main()
