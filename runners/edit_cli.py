#!/usr/bin/env python
"""Interactive single-image instruction editing (InstructPix2Pix family).

TPU-framework counterpart of models/instructpix2pix/edit_cli.py (flags
:63-75, aspect-preserving 64-multiple resize :87-92, empty-edit copy-through
:94-96, random seed when unset :85) and, via --interactive, a terminal
stand-in for edit_app.py's gradio loop (load the model once, then edit the
same image under many instructions without recompiling).

Unlike the reference (square-only in the benchmark path), the sampler here
runs at the input's 64-multiple aspect ratio; each new (H, W) costs one
jit compile, reused across --interactive edits.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import math
import random


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--edit", default=None,
                   help="editing instruction (required unless --interactive)")
    p.add_argument("--resolution", type=int, default=512)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--checkpoint_dir", default=None,
                   help="converted ip2p checkpoint (python -m "
                        "pnpinversion_tpu.convert); random weights without")
    p.add_argument("--variant", default="ip2p",
                   choices=["ip2p", "instructdiff"])
    p.add_argument("--cfg-text", type=float, default=7.5)
    p.add_argument("--cfg-image", type=float, default=1.5)
    p.add_argument("--seed", type=int, default=None)
    p.add_argument("--interactive", action="store_true",
                   help="REPL: read one instruction per line, write "
                        "<output stem>_<n>.<ext> per edit")
    return p


def fit_64(width: int, height: int, resolution: int):
    """The reference's resize arithmetic (edit_cli.py:87-91): scale so the
    long side is ~resolution, then snap both sides to multiples of 64."""
    factor = resolution / max(width, height)
    factor = math.ceil(min(width, height) * factor / 64) * 64 / min(width, height)
    return int((width * factor) // 64) * 64, int((height * factor) // 64) * 64


def main(argv=None):
    args = build_parser().parse_args(argv)
    if args.edit is None and not args.interactive:
        build_parser().error("--edit is required unless --interactive")

    import jax
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image, ImageOps

    from pnpinversion_tpu.configs import IP2P
    from pnpinversion_tpu.editors.instruct_editor import instruct_sample
    from pnpinversion_tpu.models.vae import latent_to_image, vae_encode
    from pnpinversion_tpu.pipeline import SDPipeline

    pipe = SDPipeline.create(IP2P, checkpoint_dir=args.checkpoint_dir,
                             num_ddim_steps=args.steps)

    img = Image.open(args.input).convert("RGB")
    w, h = fit_64(*img.size, args.resolution)
    img = ImageOps.fit(img, (w, h), method=Image.Resampling.LANCZOS)
    image_np = np.asarray(img)

    enc = jax.jit(lambda p, im: vae_encode(
        p, (im.astype(pipe.dtype) / 127.5 - 1.0)[None],
        pipe.config.vae, scale=False))
    dec = jax.jit(lambda p, z: latent_to_image(p, z, pipe.config.vae))
    sample = jax.jit(lambda p, ic, tc, tu, ct, ci, r: instruct_sample(
        p, pipe.schedule, pipe.config.unet, ic, tc, tu, args.steps,
        ct, ci, r, args.variant))

    image_cond = enc(pipe.params["vae"], jnp.asarray(image_np))
    text_uncond = pipe.encode_prompt([""])

    def run_one(instruction: str, out_path: str):
        if instruction == "":
            img.save(out_path)  # edit_cli.py:94-96
            return
        seed = random.randint(0, 100000) if args.seed is None else args.seed
        z = sample(pipe.params["unet"], image_cond,
                   pipe.encode_prompt([instruction]), text_uncond,
                   jnp.asarray(args.cfg_text, pipe.dtype),
                   jnp.asarray(args.cfg_image, pipe.dtype),
                   jax.random.PRNGKey(seed))
        edited = np.asarray(dec(pipe.params["vae"], z))[0]
        Image.fromarray(edited).save(out_path)
        print(f"wrote {out_path} (seed {seed})")

    if not args.interactive:
        run_one(args.edit, args.output)
        return

    stem, ext = _os.path.splitext(args.output)
    print("instruction per line (empty line = copy input, Ctrl-D to quit):")
    for n, line in enumerate(_sys.stdin):
        run_one(line.strip(), f"{stem}_{n}{ext or '.png'}")


if __name__ == "__main__":
    main()
