"""Sharded sweep runner on a virtual mesh with the tiny config."""
import json
import os

import jax
import numpy as np
import pytest
from PIL import Image

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.data.pie_bench import mask_encode
from pnpinversion_tpu.pipeline import SDPipeline


@pytest.fixture()
def mini_dataset(tmp_path):
    rng = np.random.RandomState(0)
    data = tmp_path / "data"
    (data / "annotation_images" / "0_random").mkdir(parents=True)
    mapping = {}
    for i in range(3):  # odd count: exercises batch padding
        rel = f"0_random/{i:06d}.jpg"
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(data / "annotation_images" / rel)
        mask = np.zeros((512, 512), np.uint8)
        mask[100:200, 100:200] = 1
        mapping[f"{i:06d}"] = {
            "image_path": rel,
            "original_prompt": "a [cat] on a mat",
            "editing_prompt": "a [dog] on a mat",
            "editing_instruction": "",
            "editing_type_id": "0",
            "blended_word": "cat dog",
            "mask": mask_encode(mask),
        }
    (data / "mapping_file.json").write_text(json.dumps(mapping))
    return str(data)


def test_sharded_sweep_runner(mini_dataset, tmp_path, monkeypatch):
    import runners.run_sweep_sharded as runner

    orig_create = SDPipeline.create.__func__
    monkeypatch.setattr(
        runner.SDPipeline, "create",
        classmethod(lambda cls, cfg, num_ddim_steps=50, checkpoint_dir=None,
                    dtype=None: orig_create(cls, TINY, num_ddim_steps=4)))
    out = tmp_path / "out"
    runner.main([
        "--data_path", mini_dataset, "--output_path", str(out),
        "--num_ddim_steps", "4", "--n_devices", "2",
    ])
    produced = sorted((out / "directinversion+p2p" / "annotation_images").rglob("*.jpg"))
    assert len(produced) == 3
    for p in produced:
        arr = np.asarray(Image.open(p))
        assert arr.shape == (16, 64, 3)
        assert np.isfinite(arr).all()

    # restartability: nothing re-runs
    mtimes = {p: p.stat().st_mtime for p in produced}
    runner.main([
        "--data_path", mini_dataset, "--output_path", str(out),
        "--num_ddim_steps", "4", "--n_devices", "2",
    ])
    assert all(p.stat().st_mtime == mtimes[p] for p in produced)
