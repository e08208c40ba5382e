"""PIE-Bench dataset layer: mapping-file reader, RLE mask codec, image loading.

Parity targets:
- RLE mask decode incl. the forced-1 boundary rows/cols:
  /root/reference/run_editing_p2p.py:11-27
- square-crop + resize to 512: /root/reference/utils/utils.py:27-46
- mapping_file.json item schema: /root/reference/README.md:131-142
- idempotent skip-existing output contract: /root/reference/run_editing_p2p.py:114-146

The RLE decode is vectorized (the reference uses a Python double loop); an
optional C++ fast path lives in csrc/ and is used when built.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np
from PIL import Image

try:  # optional native fast path
    from pnpinversion_tpu.data import _native  # type: ignore

    _HAVE_NATIVE = _native.available()
except Exception:  # pragma: no cover - absence of the built extension
    _native = None
    _HAVE_NATIVE = False


def mask_decode(encoded_mask: Sequence[int], image_shape=(512, 512)) -> np.ndarray:
    """Decode [start0, len0, start1, len1, ...] run-length pairs to a {0,1} mask.

    Boundary rows/cols are forced to 1 to reproduce the reference's
    annotation-error workaround (run_editing_p2p.py:22-25).
    """
    length = image_shape[0] * image_shape[1]
    mask = np.zeros((length,), dtype=np.float64)
    enc = np.asarray(encoded_mask, dtype=np.int64).reshape(-1, 2)
    if _HAVE_NATIVE and length >= 4096:
        mask = _native.rle_decode(enc, length)
    else:
        for start, run in enc:
            splice = min(int(run), length - int(start))
            if splice > 0:
                mask[start : start + splice] = 1
    mask = mask.reshape(image_shape[0], image_shape[1])
    mask[0, :] = 1
    mask[-1, :] = 1
    mask[:, 0] = 1
    mask[:, -1] = 1
    return mask


def mask_encode(mask: np.ndarray) -> List[int]:
    """Inverse of mask_decode (modulo the forced boundary): flat RLE pairs."""
    flat = np.asarray(mask).reshape(-1).astype(bool)
    padded = np.concatenate([[False], flat, [False]])
    diff = np.diff(padded.astype(np.int8))
    starts = np.where(diff == 1)[0]
    ends = np.where(diff == -1)[0]
    out: List[int] = []
    for s, e in zip(starts, ends):
        out.extend([int(s), int(e - s)])
    return out


def load_image(image_path, size: int = 512, left=0, right=0, top=0, bottom=0) -> np.ndarray:
    """Crop-to-square then resize to size x size RGB uint8."""
    if isinstance(image_path, str):
        image = np.array(Image.open(image_path))[:, :, :3]
    else:
        image = np.asarray(image_path)
    h, w, _ = image.shape
    left = min(left, w - 1)
    right = min(right, w - left - 1)
    top = min(top, h - left - 1)
    bottom = min(bottom, h - top - 1)
    image = image[top : h - bottom, left : w - right]
    h, w, _ = image.shape
    if h < w:
        offset = (w - h) // 2
        image = image[:, offset : offset + h]
    elif w < h:
        offset = (h - w) // 2
        image = image[offset : offset + w]
    if image.shape[:2] != (size, size):
        image = np.array(Image.fromarray(image).resize((size, size)))
    return image


def load_512(image_path, left=0, right=0, top=0, bottom=0) -> np.ndarray:
    """Crop-to-square then resize to 512x512 RGB uint8 (utils/utils.py:27-46)."""
    return load_image(image_path, 512, left, right, top, bottom)


@dataclasses.dataclass(frozen=True)
class PieBenchItem:
    """One annotated PIE-Bench example (README.md:131-142 schema)."""

    key: str
    image_path: str
    original_prompt: str
    editing_prompt: str
    editing_instruction: str
    editing_type_id: str
    blended_word: List[str]
    mask: np.ndarray
    # TI2I items carry a LIST of target prompts per image; prompt_index
    # disambiguates the output filename (None for plain PIE-Bench items)
    prompt_index: Optional[int] = None

    @property
    def source_prompt(self) -> str:
        return self.original_prompt.replace("[", "").replace("]", "")

    @property
    def target_prompt(self) -> str:
        return self.editing_prompt.replace("[", "").replace("]", "")

    def rel_output_path(self, images_root: str) -> str:
        """Output path relative to the method folder: the input's relpath,
        suffixed ``_<prompt_index>`` before the extension for multi-prompt
        (TI2I) items so per-prompt edits of one image don't collide."""
        rel = os.path.relpath(self.image_path, images_root)
        if self.prompt_index is not None:
            stem, ext = os.path.splitext(rel)
            rel = f"{stem}_{self.prompt_index}{ext}"
        return rel


class PieBenchDataset:
    """mapping_file.json reader with the reference's category filter and the
    idempotent skip-existing sweep contract.

    Also reads the 55-image TI2I benchmark mapping
    (data/mapping_file_ti2i_benchmark.json, /root/reference/README.md:148-153)
    via ``mapping_file=``: TI2I items carry only an image and target
    prompt(s) — no category, no mask, no source prompt — so those fields
    default (category "ti2i", empty source prompt, zero mask), the category
    filter passes them through, and a list-valued ``editing_prompt`` yields
    one item per target prompt (key suffixed ``_0``, ``_1``, ...).
    """

    def __init__(self, data_path: str, mapping_file: Optional[str] = None):
        self.data_path = data_path
        mapping_file = mapping_file or os.path.join(data_path, "mapping_file.json")
        with open(mapping_file) as f:
            self.mapping: Dict[str, dict] = json.load(f)

    def __len__(self) -> int:
        return len(self.mapping)

    def items(self, edit_category_list: Optional[Sequence[str]] = None) -> Iterator[PieBenchItem]:
        for key, item in self.mapping.items():
            cat = item.get("editing_type_id")
            if (cat is not None and edit_category_list is not None
                    and cat not in edit_category_list):
                continue
            blended = item.get("blended_word", "")
            blended_words = blended.split(" ") if blended != "" else []
            mask = (mask_decode(item["mask"]) if "mask" in item
                    else np.zeros((512, 512)))
            prompts = item.get("editing_prompt", "")
            many = isinstance(prompts, (list, tuple))
            for pi, prompt in enumerate(prompts if many else [prompts]):
                yield PieBenchItem(
                    key=f"{key}_{pi}" if many else key,
                    image_path=os.path.join(self.data_path, "annotation_images",
                                            item["image_path"]),
                    original_prompt=item.get("original_prompt", ""),
                    editing_prompt=prompt,
                    editing_instruction=item.get("editing_instruction", ""),
                    editing_type_id=cat if cat is not None else "ti2i",
                    blended_word=blended_words,
                    mask=mask,
                    prompt_index=pi if many else None,
                )

    @staticmethod
    def output_path(output_dir: str, method_folder: str, item: "PieBenchItem",
                    rel_image_path: str) -> str:
        return os.path.join(output_dir, "annotation_images", method_folder, rel_image_path)

    @staticmethod
    def should_skip(path: str, rerun_exist_images: bool) -> bool:
        return os.path.exists(path) and not rerun_exist_images
