#!/usr/bin/env python
"""StyleDiffusion runner (reference: /root/reference/run_editing_stylediffusion.py).
Note the reference's output folder name typo 'styleidffusion+p2p' is preserved."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from pnpinversion_tpu.cli import run_benchmark, standard_argparser
from pnpinversion_tpu.configs import SD14
from pnpinversion_tpu.editors.stylediffusion_editor import StyleDiffusionEditor
from pnpinversion_tpu.pipeline import SDPipeline

IMAGE_SAVE_PATHS = {"stylediffusion+p2p": "styleidffusion+p2p"}


def main(argv=None):
    parser = standard_argparser(["stylediffusion+p2p"])
    args = parser.parse_args(argv)
    pipe = SDPipeline.create(SD14, num_ddim_steps=args.num_ddim_steps,
                             checkpoint_dir=args.checkpoint_dir,
                             quantize=getattr(args, "quant", None))
    editor = StyleDiffusionEditor(pipe)

    def edit_fn(edit_method, item):
        return editor(edit_method, item.image_path, item.source_prompt,
                      item.target_prompt, guidance_scale=7.5,
                      num_inner_steps=100, tau_v=0.5, tau_c=0.6, tau_s=0.6,
                      tau_u=0.0)

    run_benchmark(args, edit_fn, IMAGE_SAVE_PATHS)


if __name__ == "__main__":
    main()
