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
            if group == "6":
                key = f"6_{m.replace('+p2p', '')}"
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


def _nan_sentinel(metric: str, mask: np.ndarray) -> bool:
    """Host-side "nan" rules (evaluate.py:29-98)."""
    if metric.endswith("_unedit_part"):
        return (1 - mask).sum() == 0
    if metric.endswith("_edit_part"):
        return mask.sum() == 0
    return False


def _evaluate_sharded(annotation: Dict, metrics: List[str],
                      src_image_folder: str, tgt_image_folders: Dict[str, str],
                      result_path: str, edit_category_list: List[str],
                      calc, batch_size: Optional[int]) -> None:
    """Batched dp-sharded evaluation (same CSV contract as the serial path)."""
    from pnpinversion_tpu.evaluation.sharded import ShardedEvaluator

    ev = ShardedEvaluator(calc)
    if batch_size is None:
        batch_size = ev.mesh.devices.size

    items = [(k, it) for k, it in annotation.items()
             if it["editing_type_id"] in edit_category_list]
    loaded = []
    for key, item in items:
        mask = mask_decode(item["mask"])[:, :, np.newaxis].repeat(3, axis=2)
        src = np.array(Image.open(
            os.path.join(src_image_folder, item["image_path"])))
        loaded.append((key, item, src, mask))

    results: Dict[tuple, object] = {}
    for fkey, folder in tgt_image_folders.items():
        for lo in range(0, len(loaded), batch_size):
            chunk = loaded[lo : lo + batch_size]
            tgts = [np.array(crop_edit_panel(Image.open(
                os.path.join(folder, it["image_path"]))))
                for _, it, _, _ in chunk]
            out = ev.evaluate_batch(
                metrics,
                np.stack([s for _, _, s, _ in chunk]), np.stack(tgts),
                np.stack([m for _, _, _, m in chunk]),
                [it["original_prompt"].replace("[", "").replace("]", "")
                 for _, it, _, _ in chunk],
                [it["editing_prompt"].replace("[", "").replace("]", "")
                 for _, it, _, _ in chunk])
            for i, (key, _, _, mask) in enumerate(chunk):
                for m in metrics:
                    results[(key, fkey, m)] = (
                        "nan" if _nan_sentinel(m, mask) else float(out[m][i]))

    with open(result_path, "a+", newline="") as f:
        w = csv.writer(f)
        for key, _ in items:
            w.writerow([key] + [results[(key, fkey, m)]
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

    for key, item in annotation.items():
        if item["editing_type_id"] not in edit_category_list:
            continue
        mask = mask_decode(item["mask"])[:, :, np.newaxis].repeat(3, axis=2)
        src_prompt = item["original_prompt"].replace("[", "").replace("]", "")
        tgt_prompt = item["editing_prompt"].replace("[", "").replace("]", "")
        src_image = Image.open(os.path.join(src_image_folder, item["image_path"]))

        row = [key]
        for _, folder in tgt_image_folders.items():
            tgt_path = os.path.join(folder, item["image_path"])
            tgt_image = crop_edit_panel(Image.open(tgt_path))
            for metric in metrics:
                row.append(calculate_metric(calc, metric, src_image, tgt_image,
                                            mask, mask, src_prompt, tgt_prompt))
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
