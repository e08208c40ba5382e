"""Evaluation CLI — CSV-schema-compatible with
/root/reference/evaluation/evaluate.py (columns ``{method}|{metric}``, one row
per image, "nan" sentinels for empty/full masks, last-512-column crop of the
4-panel strips).
"""
from __future__ import annotations

import argparse
import csv
import json
import os
from typing import Dict, List, Optional

import numpy as np
from PIL import Image

from pnpinversion_tpu.data.pie_bench import mask_decode

DEFAULT_METRICS = [
    "structure_distance",
    "psnr_unedit_part",
    "lpips_unedit_part",
    "mse_unedit_part",
    "ssim_unedit_part",
    "clip_similarity_source_image",
    "clip_similarity_target_image",
    "clip_similarity_target_image_edit_part",
]

# registry mirrored from evaluate.py:100-174 (method key -> output folder)
_METHODS_1 = [
    "ddim+p2p", "null-text-inversion+p2p_a800", "null-text-inversion+p2p_3090",
    "negative-prompt-inversion+p2p", "stylediffusion+p2p", "directinversion+p2p",
    "ddim+masactrl", "directinversion+masactrl",
    "ddim+pix2pix-zero", "directinversion+pix2pix-zero",
    "ddim+pnp", "directinversion+pnp",
]
_METHODS_2 = ["instruct-pix2pix", "instruct-diffusion", "blended-latent-diffusion",
              "directinversion+p2p"]
_GUIDANCE = [f"directinversion+p2p_guidance_{a}_{b}"
             for a in ("0", "1", "25", "5", "75") for b in ("1", "5", "25", "75")]
_METHODS_4 = ["null-text-inversion+proximal-guidance",
              "negative-prompt-inversion+proximal-guidance",
              "edit-friendly-inversion+p2p", "edict+direct_forward", "edict+p2p",
              "directinversion+p2p"]
_METHODS_5 = ["ablation_directinversion_04+p2p", "ablation_directinversion_08+p2p",
              "ablation_null-latent-inversion+p2p_a800",
              "ablation_null-latent-inversion+p2p_3090",
              "ablation_null-text-inversion_single_branch+p2p_a800",
              "ablation_null-text-inversion_single_branch+p2p_3090"]
_METHODS_6 = [f"ablation_directinversion_interval_{k}+p2p" for k in (2, 5, 10, 24, 49)]
_METHODS_7 = [f"ablation_directinversion_step_{k}+p2p" for k in (20, 100, 500)]
_METHODS_8 = ["ablation_directinversion_add-source+p2p",
              "ablation_directinversion_add-target+p2p"]


def all_tgt_image_folders(output_root: str = "output") -> Dict[str, str]:
    reg: Dict[str, str] = {}
    for group, methods in [("1", _METHODS_1), ("2", _METHODS_2), ("3", _GUIDANCE),
                           ("4", _METHODS_4), ("5", _METHODS_5), ("6", _METHODS_6),
                           ("7", _METHODS_7), ("8", _METHODS_8)]:
        for m in methods:
            key = f"{group}_{m}"
            folder = m
            if group in ("6", "7"):
                # groups 6/7 key without the +p2p suffix (evaluate.py:163-170)
                key = f"{group}_{m.replace('+p2p', '')}"
            reg[key] = os.path.join(output_root, folder, "annotation_images")
    # group-4 legacy aliases for the null-text rows (evaluate.py:148-149)
    reg["4_null-text-inverse+p2p_a800"] = os.path.join(
        output_root, "null-text-inversion+p2p_a800", "annotation_images")
    reg["4_null-text-inverse+p2p_3090"] = os.path.join(
        output_root, "null-text-inversion+p2p_3090", "annotation_images")
    # the stylediffusion RUNNER writes its reference-typo folder
    # ('styleidffusion+p2p', run_editing_stylediffusion.py:203) while the
    # reference registry reads the canonical name — fall back to the typo
    # folder when only it exists, so sweep -> evaluate round-trips
    canon = reg["1_stylediffusion+p2p"]
    typo = os.path.join(output_root, "styleidffusion+p2p", "annotation_images")
    if not os.path.isdir(canon) and os.path.isdir(typo):
        reg["1_stylediffusion+p2p"] = typo
    return reg


def calculate_metric(calc, metric: str, src_image, tgt_image, src_mask, tgt_mask,
                     src_prompt: str, tgt_prompt: str):
    """Dispatch mirroring evaluate.py:29-98 (incl. the "nan" sentinels)."""
    base, _, part = metric.partition("_")
    if metric in ("psnr", "lpips", "mse", "ssim", "structure_distance"):
        fn = getattr(calc, f"calculate_{metric}")
        return fn(src_image, tgt_image, None, None)
    for name in ("psnr", "lpips", "mse", "ssim", "structure_distance"):
        if metric == f"{name}_unedit_part":
            if (1 - src_mask).sum() == 0 or (1 - tgt_mask).sum() == 0:
                return "nan"
            return getattr(calc, f"calculate_{name}")(
                src_image, tgt_image, 1 - src_mask, 1 - tgt_mask)
        if metric == f"{name}_edit_part":
            if src_mask.sum() == 0 or tgt_mask.sum() == 0:
                return "nan"
            return getattr(calc, f"calculate_{name}")(
                src_image, tgt_image, src_mask, tgt_mask)
    if metric == "clip_similarity_source_image":
        return calc.calculate_clip_similarity(src_image, src_prompt, None)
    if metric == "clip_similarity_target_image":
        return calc.calculate_clip_similarity(tgt_image, tgt_prompt, None)
    if metric == "clip_similarity_target_image_edit_part":
        if tgt_mask.sum() == 0:
            return "nan"
        return calc.calculate_clip_similarity(tgt_image, tgt_prompt, tgt_mask)
    raise ValueError(f"unknown metric {metric!r}")


def crop_edit_panel(img: Image.Image, panel: Optional[int] = None) -> Image.Image:
    """Strips are Nx panels of height-sized squares; the edit result is the
    last panel (:271-273). panel defaults to the strip height (512 for the
    reference contract)."""
    if img.size[0] != img.size[1]:
        panel = panel or img.size[1]
        img = img.crop((img.size[0] - panel, img.size[1] - panel,
                        img.size[0], img.size[1]))
    return img


def _nan_sentinel(metric: str, mask: np.ndarray, has_mask: bool = True,
                  src_prompt: str = " ") -> bool:
    """Host-side "nan" rules (evaluate.py:29-98), extended for TI2I items
    (README.md:148-153) which carry NO mask and NO source prompt: every
    masked metric and clip_similarity_source_image is undefined there."""
    if metric.endswith("_unedit_part"):
        return not has_mask or (1 - mask).sum() == 0
    if metric.endswith("_edit_part"):
        return not has_mask or mask.sum() == 0
    if metric == "clip_similarity_source_image":
        return src_prompt.strip() == ""
    return False


def _normalized_items(annotation: Dict, edit_category_list: List[str]):
    """One evaluation row per (image, target prompt).

    PIE-Bench items pass through unchanged. TI2I items
    (mapping_file_ti2i_benchmark.json, reference README.md:148-153) have no
    ``editing_type_id`` (the category filter passes them), no ``mask``
    (``has_mask=False`` -> masked metrics emit "nan"), no source prompt
    (clip_similarity_source_image emits "nan"), and possibly a LIST of
    editing prompts — one row per prompt, with file_id and the target
    filename suffixed ``_<i>`` to match ``PieBenchItem.rel_output_path``.

    Yields dicts: file_id, src_path (input-relative), tgt_path (method
    -folder-relative), src_prompt, tgt_prompt, mask (H,W,3 float), has_mask.
    """
    for key, item in annotation.items():
        cat = item.get("editing_type_id")
        if cat is not None and cat not in edit_category_list:
            continue
        has_mask = "mask" in item
        mask = (mask_decode(item["mask"]) if has_mask
                else np.zeros((512, 512)))[:, :, np.newaxis].repeat(3, axis=2)
        src_prompt = item.get("original_prompt", "").replace("[", "").replace("]", "")
        prompts = item.get("editing_prompt", "")
        many = isinstance(prompts, (list, tuple))
        for pi, prompt in enumerate(prompts if many else [prompts]):
            tgt_path = item["image_path"]
            if many:
                stem, ext = os.path.splitext(tgt_path)
                tgt_path = f"{stem}_{pi}{ext}"
            yield {
                "file_id": f"{key}_{pi}" if many else key,
                "src_path": item["image_path"],
                "tgt_path": tgt_path,
                "src_prompt": src_prompt,
                "tgt_prompt": str(prompt).replace("[", "").replace("]", ""),
                "mask": mask,
                "has_mask": has_mask,
            }


def _retry_oom(fn, attempts: int = 3, waits=(15.0, 60.0)):
    """Retry ``fn`` on RESOURCE_EXHAUSTED.

    On the tunneled TPU backend the server reclaims a just-exited
    process's HBM asynchronously, so an evaluation started immediately
    after a big sweep can transiently fail its device_puts with
    RESOURCE_EXHAUSTED (observed in the rehearsal harness; the identical
    command succeeds moments later). Anything else re-raises immediately.
    """
    import time as _time

    for i in range(attempts):
        try:
            return fn()
        except Exception as exc:  # jax.errors.JaxRuntimeError has no stable base
            if "RESOURCE_EXHAUSTED" not in str(exc) or i == attempts - 1:
                raise
            wait = waits[min(i, len(waits) - 1)]
            print(f"eval: RESOURCE_EXHAUSTED (transient HBM reclaim?) — "
                  f"retrying in {wait:.0f}s [{i + 1}/{attempts - 1}]")
            _time.sleep(wait)


def _evaluate_sharded(annotation: Dict, metrics: List[str],
                      src_image_folder: str, tgt_image_folders: Dict[str, str],
                      result_path: str, edit_category_list: List[str],
                      calc, batch_size: Optional[int]) -> None:
    """Batched dp-sharded evaluation (same CSV contract as the serial path)."""
    from pnpinversion_tpu.evaluation.sharded import ShardedEvaluator

    ev = ShardedEvaluator(calc)
    if batch_size is None:
        batch_size = ev.mesh.devices.size

    loaded = []
    for it in _normalized_items(annotation, edit_category_list):
        it["src"] = np.array(Image.open(
            os.path.join(src_image_folder, it["src_path"])))
        loaded.append(it)

    results: Dict[tuple, object] = {}
    for fkey, folder in tgt_image_folders.items():
        for lo in range(0, len(loaded), batch_size):
            chunk = loaded[lo : lo + batch_size]
            # A missing/corrupt target (the normal state of a half-finished
            # sweep) must not lose hours of results: substitute a blank image
            # to keep the compiled batch shape, emit "nan" for that item.
            tgts, bad = [], set()
            for i, it in enumerate(chunk):
                try:
                    tgts.append(np.asarray(crop_edit_panel(Image.open(
                        os.path.join(folder, it["tgt_path"])))))
                except Exception as exc:  # noqa: BLE001 - per-image isolation
                    print(f"eval: unreadable target {fkey}/{it['tgt_path']}:"
                          f" {exc!r}")
                    tgts.append(np.zeros_like(it["src"]))
                    bad.add(i)
            out = _retry_oom(lambda: ev.evaluate_batch(
                metrics,
                np.stack([it["src"] for it in chunk]), np.stack(tgts),
                np.stack([it["mask"] for it in chunk]),
                [it["src_prompt"] for it in chunk],
                [it["tgt_prompt"] for it in chunk]))
            for i, it in enumerate(chunk):
                for m in metrics:
                    results[(it["file_id"], fkey, m)] = (
                        "nan" if i in bad or _nan_sentinel(
                            m, it["mask"], it["has_mask"], it["src_prompt"])
                        else float(out[m][i]))
        # rewrite the CSV as soon as each folder completes (the serial path
        # appends per image); a crash in a later folder keeps earlier work.
        _flush_sharded_rows(result_path, results,
                            [it["file_id"] for it in loaded],
                            tgt_image_folders, metrics)


def _flush_sharded_rows(result_path, results, file_ids, tgt_image_folders,
                        metrics) -> None:
    """Rewrite the data rows from whatever (image, folder, metric) results
    exist so far; unfinished cells stay "nan". Idempotent overwrite keeps the
    one-row-per-image CSV schema while preserving partial progress."""
    head = [f"{key}|{m}" for key in tgt_image_folders for m in metrics]
    with open(result_path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["file_id"] + head)
        for fid in file_ids:
            w.writerow([fid] + [results.get((fid, fkey, m), "nan")
                                for fkey in tgt_image_folders for m in metrics])


def evaluate(annotation_mapping_file: str, metrics: List[str],
             src_image_folder: str, tgt_image_folders: Dict[str, str],
             result_path: str, edit_category_list: List[str],
             calc=None, sharded: bool = False,
             batch_size: Optional[int] = None) -> None:
    if calc is None:
        from pnpinversion_tpu.evaluation.calculator import MetricsCalculator

        calc = MetricsCalculator()

    with open(result_path, "w", newline="") as f:
        head = [f"{key}|{m}" for key in tgt_image_folders for m in metrics]
        csv.writer(f).writerow(["file_id"] + head)

    with open(annotation_mapping_file) as f:
        annotation = json.load(f)

    if sharded:
        from pnpinversion_tpu.evaluation.sharded import SUPPORTED

        if not all(m in SUPPORTED for m in metrics):
            raise ValueError("--sharded supports only device metrics "
                             f"({SUPPORTED}); drop the flag for others")
        _evaluate_sharded(annotation, metrics, src_image_folder,
                          tgt_image_folders, result_path, edit_category_list,
                          calc, batch_size)
        return

    for it in _normalized_items(annotation, edit_category_list):
        mask = it["mask"]
        src_image = Image.open(os.path.join(src_image_folder, it["src_path"]))

        row = [it["file_id"]]
        for _, folder in tgt_image_folders.items():
            tgt_image = crop_edit_panel(
                Image.open(os.path.join(folder, it["tgt_path"])))
            for metric in metrics:
                if _nan_sentinel(metric, mask, it["has_mask"],
                                 it["src_prompt"]):
                    row.append("nan")
                else:
                    row.append(calculate_metric(
                        calc, metric, src_image, tgt_image, mask, mask,
                        it["src_prompt"], it["tgt_prompt"]))
        with open(result_path, "a+", newline="") as f:
            csv.writer(f).writerow(row)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--annotation_mapping_file", type=str,
                        default="data/mapping_file.json")
    parser.add_argument("--metrics", nargs="+", type=str, default=DEFAULT_METRICS)
    parser.add_argument("--src_image_folder", type=str, default="data/annotation_images")
    parser.add_argument("--tgt_methods", nargs="+", type=str,
                        default=["1_ddim+p2p", "1_directinversion+p2p"])
    parser.add_argument("--result_path", type=str, default="evaluation_result.csv")
    parser.add_argument("--output_root", type=str, default="output")
    parser.add_argument("--checkpoint_dir", type=str, default=None)
    parser.add_argument("--edit_category_list", nargs="+", type=str,
                        default=[str(i) for i in range(10)])
    parser.add_argument("--evaluate_whole_table", action="store_true")
    parser.add_argument("--sharded", action="store_true",
                        help="batch the metric stack over images and shard "
                             "across the device mesh")
    parser.add_argument("--batch_size", type=int, default=None)
    args = parser.parse_args()

    registry = all_tgt_image_folders(args.output_root)
    if args.evaluate_whole_table:
        # --tgt_methods holds group ids ("1".."8") in whole-table mode
        # (reference evaluate.py:216-231); match the full group prefix, not
        # the first character, so multi-digit groups stay unambiguous.
        folders = {k: v for k, v in registry.items()
                   if k.split("_", 1)[0] in args.tgt_methods}
    else:
        folders = {k: registry[k] for k in args.tgt_methods}

    from pnpinversion_tpu.evaluation.calculator import MetricsCalculator

    calc = MetricsCalculator(checkpoint_dir=args.checkpoint_dir)
    evaluate(args.annotation_mapping_file, args.metrics, args.src_image_folder,
             folders, args.result_path, args.edit_category_list, calc,
             sharded=args.sharded, batch_size=args.batch_size)


if __name__ == "__main__":
    main()
