"""InstructDiffusion multi-task loaders (training/multitask.py) on synthetic
layouts — semantics parity with dataset/seg/coco_stuff.py,
dataset/pose/pose.py:220-278, dataset/low_level/lowlevel_gopro.py."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from pnpinversion_tpu.training.data import WeightedConcat
from pnpinversion_tpu.training.multitask import (
    COLORS,
    KeypointCircleDataset,
    PairedRestorationDataset,
    SegmentationPaintDataset,
)


def _img(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture
def seg_root(tmp_path):
    root = str(tmp_path / "cocostuff")
    rng = np.random.RandomState(0)
    for i in range(3):
        img = rng.randint(0, 255, (40, 48, 3), np.uint8)
        label = np.zeros((40, 48), np.uint8)
        label[8:24, 8:24] = 5  # one object of class idx 5
        _img(os.path.join(root, "images", "train2017", f"{i:06d}.jpg"), img)
        _img(os.path.join(root, "annotations", "train2017", f"{i:06d}.png"), label)
    with open(os.path.join(root, "labels.txt"), "w") as f:
        for k in range(182):
            f.write(f"{k + 1}: class{k}\n")
    return root


def test_seg_paint_semantics(seg_root):
    ds = SegmentationPaintDataset(seg_root, crop_res=32, transparency=0.0)
    assert len(ds) == 3
    ex = ds.get(0, np.random.default_rng(0))
    assert set(ex) == {"cond_image", "edited", "edit"}
    src, tar = ex["cond_image"], ex["edited"]
    assert src.shape == tar.shape == (32, 32, 3)
    assert src.min() >= -1 and src.max() <= 1
    # painted region is a constant color from the table; the rest unchanged
    changed = np.any(src != tar, axis=-1)
    assert changed.any() and not changed.all()
    painted = ((tar[changed] + 1) * 127.5).round().astype(int)
    assert any(np.all(painted == np.array(c)) for c in COLORS.values())
    np.testing.assert_array_equal(src[~changed], tar[~changed])
    assert "class" in ex["edit"] and "pixel" in ex["edit"].lower()


def test_seg_empty_image(tmp_path):
    root = str(tmp_path / "c")
    _img(os.path.join(root, "images", "train2017", "0.jpg"),
         np.zeros((16, 16, 3), np.uint8))
    # all-255 (ignore) label -> "leave the picture as it is."
    _img(os.path.join(root, "annotations", "train2017", "0.png"),
         np.full((16, 16), 255, np.uint8))
    with open(os.path.join(root, "labels.txt"), "w") as f:
        f.write("1: thing\n")
    ds = SegmentationPaintDataset(root, crop_res=16)
    ex = ds.get(0, np.random.default_rng(0))
    assert ex["edit"] == "leave the picture as it is."
    np.testing.assert_array_equal(ex["cond_image"], ex["edited"])


@pytest.fixture
def pose_root(tmp_path):
    root = str(tmp_path / "pose")
    os.makedirs(root)
    _img(os.path.join(root, "im0.jpg"),
         np.full((64, 64, 3), 128, np.uint8))
    items = [{"image": "im0.jpg",
              "joints": [[32, 32, 2], [8, 8, 0], [300, 300, 2]]}]
    with open(os.path.join(root, "keypoints.json"), "w") as f:
        json.dump(items, f)
    return root


def test_pose_circles(pose_root):
    ds = KeypointCircleDataset(
        pose_root, crop_res=64, radius=6, transparency=0.0,
        min_prompt_num=3, max_prompt_num=3,
        joint_names=("nose", "left eye", "right eye"))
    ex = ds.get(0, np.random.default_rng(1))
    src, tar = ex["cond_image"], ex["edited"]
    changed = np.any(src != tar, axis=-1)
    # exactly one visible in-bounds joint -> one disk of ~pi*r^2 pixels
    assert 80 <= changed.sum() <= 140
    cy, cx = np.argwhere(changed).mean(axis=0)
    assert abs(cy - 32) < 2 and abs(cx - 32) < 2
    # the invisible joint may be named in the prompt but is never drawn;
    # the out-of-bounds joint is skipped entirely
    assert "circle" in ex["edit"].lower()


@pytest.fixture
def resto_root(tmp_path):
    root = str(tmp_path / "gopro")
    rng = np.random.RandomState(0)
    for i in range(4):
        a = rng.randint(0, 255, (40, 60, 3), np.uint8)
        _img(os.path.join(root, "train", "input", f"{i}.png"), a)
        _img(os.path.join(root, "train", "target", f"{i}.png"), 255 - a)
    return root


def test_restoration_pairs(resto_root):
    ds = PairedRestorationDataset(resto_root, task="deblur", size=32,
                                  flip_prob=0.0)
    assert len(ds) == 4
    ex = ds.get(1, np.random.default_rng(0))
    assert ex["cond_image"].shape == (32, 32, 3)
    # input/target stay aligned through the shared crop: target = invert(input)
    np.testing.assert_allclose(ex["cond_image"], -ex["edited"], atol=0.1)
    assert ex["edit"] in ds.prompts


def test_restoration_sample_weight(resto_root):
    assert len(PairedRestorationDataset(resto_root, sample_weight=2.0)) == 8
    under = PairedRestorationDataset(resto_root, sample_weight=0.5)
    assert len(under) == 2
    rng = np.random.default_rng(0)
    for i in range(len(under)):
        under.get(i, rng)  # index arithmetic stays in bounds


def test_restoration_instruct_prefix(resto_root):
    ds = PairedRestorationDataset(resto_root, task="deblur", size=32,
                                  instruct=True)
    ex = ds.get(0, np.random.default_rng(0))
    assert ex["edit"].startswith("Image Deblur")


def test_mixture_integration(seg_root, resto_root):
    mix = WeightedConcat(
        [SegmentationPaintDataset(seg_root, crop_res=32),
         PairedRestorationDataset(resto_root, size=32)],
        weights=[1.0, 1.0])
    rng = np.random.default_rng(0)
    for _ in range(8):
        ex = mix.sample(rng)
        assert ex["cond_image"].shape == (32, 32, 3)
        assert isinstance(ex["edit"], str)
