#!/usr/bin/env python
"""EDICT benchmark runner (reference: /root/reference/run_editing_edict.py)."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from pnpinversion_tpu.cli import run_benchmark, standard_argparser
from pnpinversion_tpu.configs import SD14
from pnpinversion_tpu.editors.edict_editor import EDICTEditor
from pnpinversion_tpu.pipeline import SDPipeline

IMAGE_SAVE_PATHS = {
    "edict+direct_forward": "edict+direct_forward",
    "edict+p2p": "edict+p2p",
}


def main(argv=None):
    parser = standard_argparser(["edict+p2p"])
    parser.add_argument("--precision", choices=["f32", "df64"], default="df64",
                        help="latent-carry precision: df64 emulates the "
                             "reference's float64 algebra (edict_functions.py"
                             ":50-52) via double-float; f32 is faster")
    args = parser.parse_args(argv)
    pipe = SDPipeline.create(SD14, num_ddim_steps=args.num_ddim_steps,
                             checkpoint_dir=args.checkpoint_dir,
                             quantize=getattr(args, "quant", None))
    editor = EDICTEditor(pipe, precision=args.precision)

    def edit_fn(edit_method, item):
        return editor(edit_method, item.image_path, item.source_prompt,
                      item.target_prompt)

    run_benchmark(args, edit_fn, IMAGE_SAVE_PATHS)


if __name__ == "__main__":
    main()
