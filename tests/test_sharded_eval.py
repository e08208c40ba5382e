"""dp-sharded batched evaluation == the serial calculator, on a virtual mesh."""
import csv
import json
import os

import numpy as np
import pytest
from PIL import Image

from pnpinversion_tpu.evaluation.calculator import MetricsCalculator
from pnpinversion_tpu.evaluation.evaluate import calculate_metric, evaluate
from pnpinversion_tpu.evaluation.sharded import ShardedEvaluator
from pnpinversion_tpu.parallel.sweep import make_dp_mesh

METRICS = ["psnr", "mse_unedit_part", "ssim_edit_part", "lpips_unedit_part",
           "structure_distance", "clip_similarity_source_image",
           "clip_similarity_target_image_edit_part"]


def test_sharded_matches_serial():
    rng = np.random.RandomState(0)
    n, size = 3, 32
    src = (rng.rand(n, size, size, 3) * 255).astype(np.uint8)
    tgt = (rng.rand(n, size, size, 3) * 255).astype(np.uint8)
    masks = np.zeros((n, size, size, 3), np.uint8)
    for i in range(n):
        masks[i, 4 : 12 + i, 6:20] = 1
    src_prompts = ["a cat on a mat", "a red car", "trees in autumn"]
    tgt_prompts = ["a dog on a mat", "a blue car", "trees in winter"]

    calc = MetricsCalculator(tiny=True)
    ev = ShardedEvaluator(calc, mesh=make_dp_mesh(2))
    out = ev.evaluate_batch(METRICS, src, tgt, masks, src_prompts, tgt_prompts)

    for i in range(n):
        for m in METRICS:
            ref = calculate_metric(calc, m, src[i], tgt[i], masks[i], masks[i],
                                   src_prompts[i], tgt_prompts[i])
            assert ref != "nan"
            assert np.isclose(out[m][i], ref, rtol=2e-3, atol=2e-4), (
                m, i, float(out[m][i]), ref)


def test_sharded_nan_sentinels_and_csv(tmp_path):
    """--sharded CSV == serial CSV, including "nan" sentinel rows."""
    rng = np.random.RandomState(1)
    size = 32
    data = tmp_path / "strips"
    src_dir = tmp_path / "src"
    mapping = {}
    for i in range(3):
        rel = f"0_x/{i:06d}.jpg"
        for root, arr in [(src_dir, rng.rand(size, size, 3)),
                          (data, rng.rand(size, 4 * size, 3))]:
            p = root / rel
            p.parent.mkdir(parents=True, exist_ok=True)
            Image.fromarray((arr * 255).astype(np.uint8)).save(p)
        # item 2: full mask -> unedit-part metrics are "nan" (mask_decode
        # forces boundary rows to 1, so an empty mask can't trigger it)
        mask = np.zeros((size, size), np.uint8)
        if i < 2:
            mask[4:20, 6:20] = 1
        else:
            mask[:] = 1
        # RLE over the native size (mask_decode default is 512 -- encode
        # manually at the test size)
        from pnpinversion_tpu.data.pie_bench import mask_encode

        mapping[f"{i:06d}"] = {
            "image_path": rel, "original_prompt": "a [cat]",
            "editing_prompt": "a [dog]", "editing_instruction": "",
            "editing_type_id": "0", "blended_word": "cat dog",
            "mask": mask_encode(mask),
        }
    (tmp_path / "mapping.json").write_text(json.dumps(mapping))

    calc = MetricsCalculator(tiny=True)
    metrics = ["psnr", "ssim_unedit_part", "clip_similarity_target_image"]
    folders = {"1_directinversion+p2p": str(data)}
    kw = dict(src_image_folder=str(src_dir), tgt_image_folders=folders,
              edit_category_list=["0"], calc=calc)

    # serial path decodes the RLE at 512 -- monkeypatch-free comparison needs
    # masks at the image size, so compare through the driver on both paths
    import pnpinversion_tpu.evaluation.evaluate as E

    orig_decode = E.mask_decode
    E.mask_decode = lambda rle: orig_decode(rle, (size, size))
    try:
        evaluate(str(tmp_path / "mapping.json"), metrics,
                 result_path=str(tmp_path / "serial.csv"), **kw)
        evaluate(str(tmp_path / "mapping.json"), metrics,
                 result_path=str(tmp_path / "sharded.csv"), sharded=True,
                 batch_size=2, **kw)
    finally:
        E.mask_decode = orig_decode

    serial = list(csv.reader(open(tmp_path / "serial.csv")))
    sharded = list(csv.reader(open(tmp_path / "sharded.csv")))
    assert serial[0] == sharded[0]
    assert len(serial) == len(sharded) == 4
    for r_s, r_b in zip(serial[1:], sharded[1:]):
        assert r_s[0] == r_b[0]
        for a, b in zip(r_s[1:], r_b[1:]):
            if a == "nan" or b == "nan":
                assert a == b == "nan"
            else:
                assert np.isclose(float(a), float(b), rtol=2e-3, atol=2e-4)
    # the empty-mask item produced the sentinel in the edit-part column
    assert serial[3][2] == "nan"
