#!/usr/bin/env python
"""InstructDiffusion runner (reference: /root/reference/run_editing_instructdiffusion.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from pnpinversion_tpu.cli import run_benchmark, standard_argparser
from pnpinversion_tpu.configs import IP2P
from pnpinversion_tpu.editors.instruct_editor import InstructEditor
from pnpinversion_tpu.pipeline import SDPipeline

IMAGE_SAVE_PATHS = {"instruct-diffusion": "instruct-diffusion"}


def main(argv=None):
    parser = standard_argparser(["instruct-diffusion"])
    args = parser.parse_args(argv)
    pipe = SDPipeline.create(IP2P, num_ddim_steps=args.num_ddim_steps,
                             checkpoint_dir=args.checkpoint_dir,
                             quantize=getattr(args, "quant", None))
    editor = InstructEditor(pipe)

    def edit_fn(edit_method, item):
        return editor(edit_method, item.image_path, item.editing_instruction,
                      steps=args.num_ddim_steps, cfg_text=5.0, cfg_image=1.25)

    run_benchmark(args, edit_fn, IMAGE_SAVE_PATHS)


if __name__ == "__main__":
    main()
