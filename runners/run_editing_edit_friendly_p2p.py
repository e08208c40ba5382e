#!/usr/bin/env python
"""Edit-friendly DDPM runner (reference: /root/reference/run_editing_edit_friendly_p2p.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from pnpinversion_tpu.cli import run_benchmark, standard_argparser
from pnpinversion_tpu.configs import SD14
from pnpinversion_tpu.editors.ef_editor import EditFriendlyEditor
from pnpinversion_tpu.pipeline import SDPipeline

IMAGE_SAVE_PATHS = {"edit-friendly-inversion+p2p": "edit-friendly-inversion+p2p"}


def main(argv=None):
    parser = standard_argparser(["edit-friendly-inversion+p2p"])
    args = parser.parse_args(argv)
    pipe = SDPipeline.create(SD14, num_ddim_steps=args.num_ddim_steps,
                             checkpoint_dir=args.checkpoint_dir,
                             quantize=getattr(args, "quant", None))
    editor = EditFriendlyEditor(pipe)

    def edit_fn(edit_method, item):
        return editor(edit_method, item.image_path, item.source_prompt,
                      item.target_prompt, source_guidance_scale=1,
                      target_guidance_scale=7.5, cross_replace_steps=0.4,
                      self_replace_steps=0.6)

    run_benchmark(args, edit_fn, IMAGE_SAVE_PATHS)


if __name__ == "__main__":
    main()
