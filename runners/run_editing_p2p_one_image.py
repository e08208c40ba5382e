#!/usr/bin/env python
"""Single-image P2P edit (reference: /root/reference/run_editing_p2p_one_image.py).
The minimum end-to-end slice; CPU-runnable."""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse

from pnpinversion_tpu.configs import SD14, TINY
from pnpinversion_tpu.editors.p2p_editor import P2PEditor
from pnpinversion_tpu.pipeline import SDPipeline


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--image_path", type=str, required=True)
    parser.add_argument("--prompt_src", type=str, required=True)
    parser.add_argument("--prompt_tar", type=str, required=True)
    parser.add_argument("--output_path", type=str, default="edited.png")
    parser.add_argument("--edit_method", type=str, default="directinversion+p2p")
    parser.add_argument("--blended_word", nargs="+", type=str, default=[])
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--num_ddim_steps", type=int, default=50)
    parser.add_argument("--tiny", action="store_true",
                        help="tiny random-weight config (smoke test)")
    args = parser.parse_args(argv)

    config = TINY if args.tiny else SD14
    pipe = SDPipeline.create(config, num_ddim_steps=args.num_ddim_steps,
                             checkpoint_dir=args.checkpoint_dir,
                             quantize=getattr(args, "quant", None))
    editor = P2PEditor(pipe)
    blended = args.blended_word
    image = editor(
        args.edit_method,
        image_path=args.image_path,
        prompt_src=args.prompt_src,
        prompt_tar=args.prompt_tar,
        guidance_scale=7.5,
        cross_replace_steps=0.4,
        self_replace_steps=0.6,
        blend_word=(((blended[0],), (blended[1],)) if len(blended) else None),
        eq_params=({"words": (blended[1],), "values": (2,)} if len(blended) else None),
    )
    image.save(args.output_path)
    print(f"saved {args.output_path}")


if __name__ == "__main__":
    main()
