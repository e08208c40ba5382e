#!/usr/bin/env python
"""Production-shape InstructPix2Pix training on the real chip (VERDICT r4 #4).

Synthesizes a 256px seeds.json dataset, then drives the REAL CLI
(runners/run_training_instructpix2pix.py) as a fresh subprocess — the
production execution mode — at the reference's per-device shape
(configs/train.yaml: 256px, micro-batch 32, accumulate_grad_batches 4) and
records s/step (steady, past the compile step), peak HBM, and the loss
curve into docs/train_bench.json. Also exercises the checkpoint
save/restore resume path end-to-end on the chip.

Random weights + random pixels: the measurement is step TIME and memory,
not convergence (zero-egress box — see STATUS.md known gaps); the loss
values are still recorded to show the optimizer descends.

Usage: python scripts/train_on_chip.py [--steps 12] [--batch 32] [--accum 4]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))


def build_dataset(root: str, n_items: int, res: int) -> str:
    import numpy as np
    from PIL import Image

    rng = np.random.default_rng(0)
    seeds = []
    os.makedirs(root, exist_ok=True)
    for i in range(n_items):
        name = f"{i:07d}"
        d = os.path.join(root, name)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "prompt.json"), "w") as f:
            json.dump({"input": f"a photo of object {i}",
                       "edit": f"make object {i} golden",
                       "output": f"a photo of golden object {i}"}, f)
        for s in range(2):
            for suffix in ("0", "1"):
                arr = rng.integers(0, 255, (res, res, 3), dtype=np.uint8)
                Image.fromarray(arr).save(os.path.join(d, f"{s}_{suffix}.jpg"))
        seeds.append([name, [0, 1]])
    with open(os.path.join(root, "seeds.json"), "w") as f:
        json.dump(seeds, f)
    return root


def run(argv, timeout):
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "runners",
                                      "run_training_instructpix2pix.py")] + argv,
        capture_output=True, text=True, timeout=timeout, cwd=REPO)
    return proc, time.time() - t0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--res", type=int, default=256)
    ap.add_argument("--items", type=int, default=24)
    ap.add_argument("--no_remat", action="store_true")
    ap.add_argument("--workdir", default="/tmp/train_on_chip")
    ap.add_argument("--timeout", type=int, default=5400)
    ap.add_argument("--out", default=os.path.join(REPO, "docs",
                                                  "train_bench.json"))
    args = ap.parse_args()

    data = os.path.join(args.workdir, "ds")
    if not os.path.exists(os.path.join(data, "seeds.json")):
        build_dataset(data, args.items, args.res)
    outdir = os.path.join(args.workdir, "run")

    argv = ["--data_path", data, "--output_dir", outdir,
            "--batch_per_step", str(args.batch),
            "--accumulate_grad_batches", str(args.accum),
            "--max_steps", str(args.steps), "--log_every", "1",
            "--save_every", str(args.steps),
            "--min_resize_res", str(args.res),
            "--max_resize_res", str(args.res),
            "--crop_res", str(args.res), "--seed", "0"]
    if not args.no_remat:
        argv.append("--remat")

    proc, wall = run(argv, args.timeout)
    report = {"batch_per_step": args.batch, "accum": args.accum,
              "res": args.res, "remat": not args.no_remat,
              "images_per_opt_step": args.batch * args.accum,
              "steps": args.steps, "rc": proc.returncode,
              "wall_s": round(wall, 1)}
    if proc.returncode != 0:
        report["stderr_tail"] = proc.stderr[-2000:]
    else:
        log = [json.loads(l) for l in
               open(os.path.join(outdir, "train_log.jsonl"))]
        trains = [l for l in log if l["event"] == "train"]
        # steady s/step from the JSONL timestamps past the compile step
        ts = [l["ts"] for l in trains]
        gaps = [b - a for a, b in zip(ts[1:], ts[2:])]
        report.update(
            losses=[round(l["loss"], 4) for l in trains],
            grad_norms=[round(l["grad_norm"], 3) for l in trains],
            peak_hbm_gb=trains[0].get("peak_hbm_gb"),
            first_step_s=round(ts[1] - ts[0], 1) if len(ts) > 1 else None,
            steady_s_per_step=round(sorted(gaps)[len(gaps) // 2], 2)
            if gaps else None,
        )
        if report["steady_s_per_step"]:
            report["steady_images_per_s"] = round(
                args.batch * args.accum / report["steady_s_per_step"], 2)

        # resume: restore the checkpoint and take one more step
        proc2, _ = run(argv[:argv.index("--max_steps") + 1]
                       + [str(args.steps + 1)]
                       + argv[argv.index("--max_steps") + 2:]
                       + ["--resume"], args.timeout)
        report["resume_rc"] = proc2.returncode
        if proc2.returncode != 0:
            report["resume_stderr_tail"] = proc2.stderr[-1500:]

    with open(args.out, "w") as f:
        json.dump(report, f, indent=2, sort_keys=True)
    print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
