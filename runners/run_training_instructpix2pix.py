#!/usr/bin/env python
"""Train an InstructPix2Pix-style edit-conditioned diffusion model on TPU.

TPU-native replacement for the reference's two trainers: the ip2p Lightning
entry (models/instructpix2pix/main.py + configs/train.yaml) and the
InstructDiffusion torch.distributed/DeepSpeed entry
(models/InstructDiffusion/main.py, utils/deepspeed.py,
scripts/run_multinode.sh). One jitted dp(x tp)-sharded train step; gradient
accumulation inside the step; bf16 compute over f32 master weights (no
fp16 loss-scaling machinery needed); ZeRO-style sharded Adam moments;
orbax checkpoints; JSONL metrics log (the reference logs to wandb +
an AverageMeter console line, main.py:357-390).

Data: one or more ip2p `seeds.json` dataset directories (--data_path,
repeatable, with optional --data_weight mirroring InstructDiffusion's
multi-task sample weights). Initialization: --checkpoint_dir points at a
converted SD checkpoint (python -m pnpinversion_tpu.convert); its 4-channel
conv_in is zero-extended to 8 channels (the ip2p init). Without it a
random-weight pipeline is used (zero-egress CI).

Multi-host: --num_processes/--process_id/--coordinator_address join a
jax.distributed cluster (replaces scripts/run_multinode.sh's
torch.distributed.launch); each process feeds its local chips from a
process-disjoint data stream.
"""
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data_path", action="append", required=True,
                   help="ip2p dataset dir (seeds.json layout); repeatable")
    p.add_argument("--data_weight", action="append", type=float, default=None,
                   help="per-dataset sample weight (InstructDiffusion-style)")
    p.add_argument("--output_dir", required=True)
    p.add_argument("--checkpoint_dir", default=None,
                   help="converted SD checkpoint to initialize from")
    p.add_argument("--resume", action="store_true",
                   help="restore the latest checkpoint in --output_dir")
    p.add_argument("--batch_per_step", type=int, default=32,
                   help="micro-batch per optimizer sub-step (train.yaml: 32)")
    p.add_argument("--accumulate_grad_batches", type=int, default=4)
    p.add_argument("--max_steps", type=int, default=10000)
    p.add_argument("--base_lr", type=float, default=1e-4)
    p.add_argument("--no_scale_lr", action="store_true",
                   help="disable accum*ndev*batch LR scaling (main.py:743)")
    p.add_argument("--warmup_steps", type=int, default=0)
    p.add_argument("--weight_decay", type=float, default=0.01)
    p.add_argument("--clip_grad", type=float, default=0.0)
    p.add_argument("--uncond_prob", type=float, default=0.05)
    p.add_argument("--ema_decay", type=float, default=0.9999)
    p.add_argument("--no_zero", action="store_true",
                   help="replicate optimizer state instead of dp-sharding it")
    p.add_argument("--remat", action="store_true",
                   help="jax.checkpoint the UNet forward (activation HBM vs "
                        "~1/3 more FLOPs; needed for single-chip 256px runs)")
    p.add_argument("--crop_res", type=int, default=256)
    p.add_argument("--min_resize_res", type=int, default=256)
    p.add_argument("--max_resize_res", type=int, default=256)
    p.add_argument("--flip_prob", type=float, default=0.5)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=10)
    p.add_argument("--val_every", type=int, default=0,
                   help="EMA val-loss cadence; 0 disables")
    p.add_argument("--val_batches", type=int, default=4)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--n_devices", type=int, default=None)
    p.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--coordinator_address", type=str, default=None)
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)

    from pnpinversion_tpu.cli import setup_compile_cache
    from pnpinversion_tpu.parallel import multihost

    multihost.initialize(args.coordinator_address, args.num_processes,
                         args.process_id)
    setup_compile_cache()

    from pnpinversion_tpu.configs import IP2P
    from pnpinversion_tpu.parallel.sweep import make_dp_tp_mesh
    from pnpinversion_tpu.pipeline import SDPipeline
    from pnpinversion_tpu.training.data import (
        EditPairDataset,
        WeightedConcat,
        batches,
    )
    from pnpinversion_tpu.training.trainer import (
        EditTrainer,
        TrainConfig,
        extend_conv_in,
    )
    from pnpinversion_tpu.utils.observability import RunLogger

    mesh = make_dp_tp_mesh(args.n_devices, args.tp)
    n_dp = mesh.shape["dp"]
    assert args.batch_per_step % n_dp == 0, (args.batch_per_step, n_dp)

    # model: SD weights with conv_in zero-extended 4 -> 8 channels. A
    # converted ip2p checkpoint (already 8ch) also loads unchanged.
    if args.checkpoint_dir is not None:
        pipe = SDPipeline.create(IP2P, checkpoint_dir=args.checkpoint_dir)
    else:
        pipe = SDPipeline.create(IP2P)
    model_cfg = pipe.config  # IP2P, or a test miniature injected via create
    unet = pipe.params["unet"]
    if unet["conv_in"]["kernel"].shape[2] < model_cfg.unet.in_channels:
        unet = extend_conv_in(unet, model_cfg.unet.in_channels)

    cfg = TrainConfig(
        base_lr=args.base_lr, scale_lr=not args.no_scale_lr,
        warmup_steps=args.warmup_steps, weight_decay=args.weight_decay,
        clip_grad=args.clip_grad, accum=args.accumulate_grad_batches,
        uncond_prob=args.uncond_prob, ema_decay=args.ema_decay,
        zero=not args.no_zero, remat=args.remat,
        dtype=jnp.bfloat16 if args.dtype == "bf16" else jnp.float32,
    )
    null_ids = np.asarray(pipe.tokenize([""]))[0]
    trainer = EditTrainer(
        model_cfg, {"vae": pipe.params["vae"], "text": pipe.params["text"]},
        unet, mesh, cfg, args.batch_per_step, null_ids)
    if args.resume:
        trainer.restore(directory=args.output_dir)

    mk = lambda path, split, flip: EditPairDataset(
        path, split=split, min_resize_res=args.min_resize_res,
        max_resize_res=args.max_resize_res, crop_res=args.crop_res,
        flip_prob=flip)
    train_src = WeightedConcat(
        [mk(p, "train", args.flip_prob) for p in args.data_path],
        args.data_weight)
    val_src = WeightedConcat([mk(p, "val", 0.0) for p in args.data_path],
                             args.data_weight)
    val_every = args.val_every if len(val_src) > 0 else 0

    A, B = args.accumulate_grad_batches, args.batch_per_step

    def device_batch(stream):
        """A*B host items -> {edited,cond_image: (A,B,H,W,3), ids: (A,B,77)}."""
        parts = [next(stream) for _ in range(A)]
        ids = [np.asarray(jax.device_get(pipe.tokenize(p["edit"])))
               for p in parts]
        return {
            "edited": np.stack([p["edited"] for p in parts]),
            "cond_image": np.stack([p["cond_image"] for p in parts]),
            "ids": np.stack(ids),
        }

    os.makedirs(args.output_dir, exist_ok=True)
    logger = RunLogger(os.path.join(args.output_dir, "train_log.jsonl")
                       if jax.process_index() == 0 else None)
    train_stream = batches(train_src, B, seed=args.seed,
                           process_index=jax.process_index())
    val_stream = batches(val_src, B, seed=args.seed + 1,
                         process_index=jax.process_index())

    root = jax.random.PRNGKey(args.seed + jax.process_index())
    start = int(jax.device_get(trainer.state["step"]))
    t0 = time.time()
    for step in range(start, args.max_steps):
        rng = jax.random.fold_in(root, step)
        metrics = trainer.train_step(device_batch(train_stream), rng)
        if (step + 1) % args.log_every == 0 or step == start:
            m = {k: float(jax.device_get(v)) for k, v in metrics.items()}
            m.update(step=step + 1, lr=trainer.learning_rate(step),
                     s_per_step=(time.time() - t0) / max(1, step + 1 - start))
            if step == start:  # HBM footprint once, after the first step
                try:
                    stats = jax.local_devices()[0].memory_stats() or {}
                    m["peak_hbm_gb"] = round(
                        stats.get("peak_bytes_in_use", 0) / 2**30, 2)
                except Exception:
                    pass
            logger.log("train", **m)
            print(json.dumps({"train": m}), flush=True)
        if val_every and (step + 1) % val_every == 0:
            vl = np.mean([
                float(jax.device_get(trainer.val_step(
                    device_batch(val_stream), jax.random.fold_in(rng, i))))
                for i in range(args.val_batches)])
            logger.log("val", step=step + 1, loss=vl)
            print(json.dumps({"val": {"step": step + 1, "loss": vl}}), flush=True)
        if args.save_every and (step + 1) % args.save_every == 0:
            trainer.save(args.output_dir)
    if args.max_steps > start:
        path = trainer.save(args.output_dir)
        logger.log("done", step=args.max_steps, checkpoint=path)


if __name__ == "__main__":
    main()
