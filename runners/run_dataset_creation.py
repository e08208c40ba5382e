#!/usr/bin/env python
"""Generate InstructPix2Pix training pairs: P2P sampling + CLIP filtering.

TPU-native replacement for
models/instructpix2pix/dataset_creation/generate_img_dataset.py (flags
:116-214) and prepare_dataset.py. For each {"caption", "edit", "output"}
record in --prompts_file (the generate_txt_dataset.py / released-454k
format), candidate image pairs are sampled from a text-to-image SD model
with self-attention prompt-to-prompt sharing between the caption and the
output prompt, scored with CLIP (per-image text sim, directional sim,
image-image sim), filtered, and the best --max_out_samples pairs are
written in the seeds.json dataset layout that
runners/run_training_instructpix2pix.py consumes.

Differences from the reference, by design:
- candidates are generated in device batches (--batch pairs per dispatch,
  vmapped; each pair is an internal batch-4 CFG program);
- --seed makes the whole run reproducible (the reference draws a fresh
  global seed per invocation, generate_img_dataset.py:216);
- prompts that already have metadata.jsonl are skipped (restartable, like
  every sweep runner in this framework);
- --n_partitions/--partition shard prompts across independent invocations
  exactly like the reference (np.array_split semantics).
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--prompts_file", required=True,
                   help='.jsonl of {"caption","edit","output"} records')
    p.add_argument("--checkpoint_dir", default=None,
                   help="converted SD checkpoint (python -m pnpinversion_tpu.convert); "
                        "random weights without it (CI)")
    p.add_argument("--model", default="sd14", choices=["sd14", "sd21"])
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--n_samples", type=int, default=100,
                   help="candidates per prompt before CLIP filtering")
    p.add_argument("--max_out_samples", type=int, default=4)
    p.add_argument("--n_partitions", type=int, default=1)
    p.add_argument("--partition", type=int, default=0)
    p.add_argument("--min_p2p", type=float, default=0.1)
    p.add_argument("--max_p2p", type=float, default=0.9)
    p.add_argument("--min_cfg", type=float, default=7.5)
    p.add_argument("--max_cfg", type=float, default=15.0)
    p.add_argument("--clip_threshold", type=float, default=0.2)
    p.add_argument("--clip_dir_threshold", type=float, default=0.2)
    p.add_argument("--clip_img_threshold", type=float, default=0.7)
    p.add_argument("--batch", type=int, default=4,
                   help="candidate pairs per device dispatch")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--prepare_only", action="store_true",
                   help="only (re)write seeds.json from existing prompt dirs")
    p.add_argument("--no_prepare", action="store_true",
                   help="skip writing seeds.json (multi-partition runs: "
                        "run --prepare_only once at the end)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from pnpinversion_tpu.training import dataset_creation as dc

    if args.prepare_only:
        path = dc.prepare_dataset(args.out_dir)
        print(json.dumps({"seeds_json": path}), flush=True)
        return

    import jax.numpy as jnp
    import numpy as np

    from pnpinversion_tpu.configs import SD14, SD21
    from pnpinversion_tpu.pipeline import SDPipeline

    cfg = SD14 if args.model == "sd14" else SD21
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    pipe = SDPipeline.create(cfg, checkpoint_dir=args.checkpoint_dir,
                             dtype=dtype)
    generator = dc.PairGenerator(pipe, args.steps)
    clip_filter = dc.PairClipFilter(checkpoint_dir=args.checkpoint_dir,
                                    tokenizer=pipe.tokenizer
                                    if args.checkpoint_dir is None else None)
    thresholds = dc.FilterThresholds(
        clip_threshold=args.clip_threshold,
        clip_dir_threshold=args.clip_dir_threshold,
        clip_img_threshold=args.clip_img_threshold)

    prompts = dc.load_prompts(args.prompts_file)
    part = dc.partition_prompts(prompts, args.n_partitions, args.partition)
    os.makedirs(args.out_dir, exist_ok=True)
    print(json.dumps({"partition": args.partition,
                      "n_partitions": args.n_partitions,
                      "prompts": len(part)}), flush=True)

    for i, prompt in part:
        t0 = time.time()
        rng = np.random.default_rng(
            np.random.SeedSequence([args.seed, i]))
        kept = dc.generate_for_prompt(
            prompt, os.path.join(args.out_dir, f"{i:07d}"),
            generator, clip_filter,
            n_samples=args.n_samples, max_out_samples=args.max_out_samples,
            min_p2p=args.min_p2p, max_p2p=args.max_p2p,
            min_cfg=args.min_cfg, max_cfg=args.max_cfg,
            thresholds=thresholds, batch=args.batch, rng=rng)
        print(json.dumps({"prompt": i, "kept": kept,
                          "seconds": round(time.time() - t0, 2)}),
              flush=True)

    if not args.no_prepare:
        path = dc.prepare_dataset(args.out_dir)
        print(json.dumps({"seeds_json": path}), flush=True)


if __name__ == "__main__":
    main()
