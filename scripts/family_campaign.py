#!/usr/bin/env python
"""On-chip campaign: exercise each editing family at FULL 512px through the
real sweep CLI and record per-family steady-state s/image (VERDICT r2 #1).

Builds a small 512px demo set (random pixels — zero egress, weights are
random anyway; shapes, I/O and compute are the production path), then runs
`runners/run_sweep_sharded.py --method <m>` as a fresh subprocess per family
(matching how production sweeps run), parses the run-log JSONL for
image_done gaps, and appends results to docs/family_bench.json.

Usage:  python scripts/family_campaign.py [--methods m1 m2 ...] [--images N]
        [--timeout S]
"""
import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_METHODS = [
    "null-text-inversion+p2p",
    "null-text-inversion+proximal-guidance",
    "edit-friendly-inversion+p2p",
    "blended-latent-diffusion",
    "instruct-pix2pix",
    "instruct-diffusion",
    "directinversion+pix2pix-zero",
    "stylediffusion+p2p",
]


def build_demo(data_path: str, n: int) -> None:
    import numpy as np
    from PIL import Image

    from pnpinversion_tpu.data.pie_bench import mask_encode

    imgdir = os.path.join(data_path, "annotation_images", "0_random")
    os.makedirs(imgdir, exist_ok=True)
    rng = np.random.RandomState(0)
    pairs = [
        ("a [cat] sitting on a wooden table", "a [dog] sitting on a wooden table",
         "change the cat to a dog", "cat dog"),
        ("a round [cake] with orange frosting", "a square [cake] with orange frosting",
         "make the cake square", "cake cake"),
        ("a [car] parked on the street", "a [bicycle] parked on the street",
         "replace the car with a bicycle", "car bicycle"),
        ("a vase of [roses] on a desk", "a vase of [tulips] on a desk",
         "swap the roses for tulips", "roses tulips"),
    ]
    mapping = {}
    for i in range(n):
        rel = f"0_random/{i:06d}.jpg"
        Image.fromarray((rng.rand(512, 512, 3) * 255).astype(np.uint8)).save(
            os.path.join(data_path, "annotation_images", rel))
        mask = np.zeros((512, 512), np.uint8)
        mask[128 + 8 * i : 384, 160 : 352 + 8 * i] = 1
        src, tgt, instr, blend = pairs[i % len(pairs)]
        mapping[f"{i:06d}"] = {
            "image_path": rel, "original_prompt": src, "editing_prompt": tgt,
            "editing_instruction": instr, "editing_type_id": "0",
            "blended_word": blend, "mask": mask_encode(mask),
        }
    with open(os.path.join(data_path, "mapping_file.json"), "w") as f:
        json.dump(mapping, f)


def steady_s_per_image(run_log: str):
    """Steady-state s/image from image_done timestamps.

    The pipelined saver makes saves bursty (a whole chunk's image_done
    events land within ~0.3 s while the next chunk computes), so a plain
    median inter-image gap reads near zero. Group events into bursts
    (>1 s gap starts a new burst) and take the median inter-burst span
    divided by the burst size; with batch 1 every image is its own burst
    and this degenerates to the old median-gap estimator."""
    ts, keys = [], set()
    try:
        with open(run_log) as f:
            for line in f:
                rec = json.loads(line)
                if rec.get("event") == "image_done":
                    ts.append(rec["ts"])
                    keys.add(rec.get("key"))
    except FileNotFoundError:
        return None, 0
    n_done = len(keys) if keys else len(ts)
    if len(ts) < 2:
        return None, n_done
    bursts = [[ts[0]]]
    for a, b in zip(ts, ts[1:]):
        if b - a > 1.0:
            bursts.append([])
        bursts[-1].append(b)
    if len(bursts) < 2:
        gaps = sorted(b - a for a, b in zip(ts, ts[1:]))
        return gaps[len(gaps) // 2], n_done
    size = max(len(b) for b in bursts)
    spans = sorted(b2[0] - b1[0] for b1, b2 in zip(bursts, bursts[1:]))
    return spans[len(spans) // 2] / size, n_done


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--methods", nargs="+", default=DEFAULT_METHODS)
    ap.add_argument("--images", type=int, default=4)
    ap.add_argument("--timeout", type=int, default=3600)
    ap.add_argument("--workdir", default="/tmp/family_campaign")
    ap.add_argument("--out", default=os.path.join(REPO, "docs", "family_bench.json"))
    ap.add_argument("--num_ddim_steps", type=int, default=50)
    ap.add_argument("--quant", default=None, choices=["none", "w8"],
                    help="pass through to the runner; results are keyed "
                         "<method>@<quant> so bf16 records are preserved")
    ap.add_argument("--batch_per_device", type=int, default=0,
                    help="pass through to the runner (0 = its auto default); "
                         "recorded in each result row")
    args = ap.parse_args()

    data = os.path.join(args.workdir, "data")
    mapping_path = os.path.join(data, "mapping_file.json")
    if os.path.exists(mapping_path):
        # the demo set is cached across invocations; a stale set with a
        # different size silently skewed the recorded "images" field
        # (r3 records showed images:8/done:4 and images:4/done:8)
        with open(mapping_path) as f:
            n_have = len(json.load(f))
        if n_have != args.images:
            import shutil
            shutil.rmtree(data)
            # captions.json is derived from the mapping — a stale copy
            # breaks the pix2pix-zero run (no BLIP weights to re-caption)
            caps = os.path.join(args.workdir, "captions.json")
            if os.path.exists(caps):
                os.remove(caps)
    if not os.path.exists(mapping_path):
        build_demo(data, args.images)

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for method in args.methods:
        outdir = os.path.join(args.workdir, "out", method.replace("/", "_"))
        log = os.path.join(args.workdir, f"log_{method.replace('/', '_')}.jsonl")
        if os.path.exists(outdir):
            # skip-existing would turn a rerun into a no-op "measurement"
            import shutil
            shutil.rmtree(outdir)
        if os.path.exists(log):
            os.remove(log)
        cmd = [sys.executable, os.path.join(REPO, "runners", "run_sweep_sharded.py"),
               "--data_path", data, "--output_path", outdir,
               "--method", method, "--run_log", log,
               "--num_ddim_steps", str(args.num_ddim_steps)]
        if args.quant and args.quant != "none":
            cmd += ["--quant", args.quant]
        if args.batch_per_device:
            cmd += ["--batch_per_device", str(args.batch_per_device)]
        if method.endswith("pix2pix-zero"):
            # zero egress: no BLIP weights — supply the captions the
            # captioner would produce (the production --caption_file path)
            caps = os.path.join(args.workdir, "captions.json")
            if not os.path.exists(caps):
                with open(os.path.join(data, "mapping_file.json")) as f:
                    mapping = json.load(f)
                with open(caps, "w") as f:
                    json.dump({k: it["original_prompt"].replace("[", "")
                               .replace("]", "") for k, it in mapping.items()}, f)
            cmd += ["--caption_file", caps]
        print(f"=== {method} ===", flush=True)
        t0 = time.time()
        proc = subprocess.run(cmd, capture_output=True, text=True,
                              timeout=args.timeout, cwd=REPO)
        wall = time.time() - t0
        steady, n_done = steady_s_per_image(log)
        rec = {"wall_s": round(wall, 1), "images_done": n_done,
               "steady_s_per_image": round(steady, 2) if steady else None,
               "rc": proc.returncode, "steps": args.num_ddim_steps,
               "images": args.images,
               "batch_per_device": args.batch_per_device or "auto"}
        if proc.returncode != 0:
            rec["stderr_tail"] = proc.stderr[-2000:]
        key = method if not args.quant or args.quant == "none" \
            else f"{method}@{args.quant}"
        results[key] = rec
        print(json.dumps({key: rec}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2, sort_keys=True)

    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
