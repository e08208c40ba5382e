#!/usr/bin/env python
"""MasaCtrl benchmark runner (reference: /root/reference/run_editing_masactrl.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from pnpinversion_tpu.cli import run_benchmark, standard_argparser
from pnpinversion_tpu.configs import SD14
from pnpinversion_tpu.editors.masactrl_editor import MasaCtrlEditor
from pnpinversion_tpu.pipeline import SDPipeline

IMAGE_SAVE_PATHS = {
    "ddim+masactrl": "ddim+masactrl",
    "directinversion+masactrl": "directinversion+masactrl",
}


def main(argv=None):
    parser = standard_argparser(["directinversion+masactrl"])
    args = parser.parse_args(argv)
    pipe = SDPipeline.create(SD14, num_ddim_steps=args.num_ddim_steps,
                             checkpoint_dir=args.checkpoint_dir,
                             quantize=getattr(args, "quant", None))
    editor = MasaCtrlEditor(pipe)

    def edit_fn(edit_method, item):
        return editor(edit_method, item.image_path, item.source_prompt,
                      item.target_prompt, guidance_scale=7.5, step=4, layper=10)

    run_benchmark(args, edit_fn, IMAGE_SAVE_PATHS)


if __name__ == "__main__":
    main()
