#!/usr/bin/env python
"""pix2pix-zero runner (reference: /root/reference/run_editing_pix2pix_zero.py).

Requires a captioner (BLIP) — pass --caption_file with a JSON mapping of
image keys to captions, or converted BLIP weights via --checkpoint_dir.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import json

from pnpinversion_tpu.cli import run_benchmark, standard_argparser
from pnpinversion_tpu.configs import SD14
from pnpinversion_tpu.editors.pix2pix_zero_editor import Pix2PixZeroEditor
from pnpinversion_tpu.pipeline import SDPipeline

IMAGE_SAVE_PATHS = {
    "ddim+pix2pix-zero": "ddim+pix2pix-zero",
    "directinversion+pix2pix-zero": "directinversion+pix2pix-zero",
}


def main(argv=None):
    parser = standard_argparser(["directinversion+pix2pix-zero"])
    parser.add_argument("--caption_file", type=str, default=None,
                        help="JSON {image_path: caption} to use instead of BLIP")
    args = parser.parse_args(argv)
    pipe = SDPipeline.create(SD14, num_ddim_steps=args.num_ddim_steps,
                             checkpoint_dir=args.checkpoint_dir,
                             quantize=getattr(args, "quant", None))

    captioner = None
    if args.checkpoint_dir is not None:
        try:
            from pnpinversion_tpu.models.blip import make_blip_captioner

            captioner = make_blip_captioner(args.checkpoint_dir)
        except (ImportError, FileNotFoundError):
            captioner = None
    editor = Pix2PixZeroEditor(pipe, captioner=captioner)

    captions = {}
    if args.caption_file:
        with open(args.caption_file) as f:
            captions = json.load(f)

    def edit_fn(edit_method, item):
        return editor(edit_method, item.image_path, item.source_prompt,
                      item.target_prompt, guidance_scale=7.5,
                      caption=captions.get(item.key))

    run_benchmark(args, edit_fn, IMAGE_SAVE_PATHS)


if __name__ == "__main__":
    main()
