#!/usr/bin/env python
"""P2P-family benchmark runner (reference: /root/reference/run_editing_p2p.py).

Same CLI and output contract; method names are identity-mapped to their
output folders. Runs on the default JAX backend (TPU when available).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys

from pnpinversion_tpu.cli import run_benchmark, standard_argparser
from pnpinversion_tpu.configs import SD14
from pnpinversion_tpu.editors.p2p_editor import GUIDANCE_GRID, P2PEditor
from pnpinversion_tpu.pipeline import SDPipeline

P2P_METHODS = (
    ["ddim+p2p", "null-text-inversion+p2p", "null-text-inversion+p2p_a800",
     "null-text-inversion+p2p_3090", "negative-prompt-inversion+p2p",
     "directinversion+p2p"]
    + [f"directinversion+p2p_guidance_{a}_{b}"
       for a in ("0", "1", "25", "5", "75") for b in ("1", "5", "25", "75")]
    + ["null-text-inversion+proximal-guidance",
       "negative-prompt-inversion+proximal-guidance",
       "ablation_null-latent-inversion+p2p",
       "ablation_directinversion_08+p2p", "ablation_directinversion_04+p2p"]
    + [f"ablation_directinversion_interval_{k}+p2p" for k in (2, 5, 10, 24, 49)]
    + ["ablation_null-text-inversion_single_branch+p2p",
       "ablation_directinversion_add-source+p2p",
       "ablation_directinversion_add-target+p2p"]
)
IMAGE_SAVE_PATHS = {m: m for m in P2P_METHODS}


def main(argv=None):
    parser = standard_argparser(["directinversion+p2p"])
    args = parser.parse_args(argv)
    pipe = SDPipeline.create(SD14, num_ddim_steps=args.num_ddim_steps,
                             checkpoint_dir=args.checkpoint_dir,
                             quantize=getattr(args, "quant", None))
    editor = P2PEditor(pipe)

    def edit_fn(edit_method, item):
        blended = item.blended_word
        return editor(
            edit_method,
            image_path=item.image_path,
            prompt_src=item.source_prompt,
            prompt_tar=item.target_prompt,
            guidance_scale=7.5,
            cross_replace_steps=0.4,
            self_replace_steps=0.6,
            blend_word=(((blended[0],), (blended[1],)) if len(blended) else None),
            eq_params=({"words": (blended[1],), "values": (2,)} if len(blended) else None),
            proximal="l0",
            quantile=0.75,
            use_inversion_guidance=True,
            recon_lr=1,
            recon_t=400,
        )

    run_benchmark(args, edit_fn, IMAGE_SAVE_PATHS)


if __name__ == "__main__":
    main()
