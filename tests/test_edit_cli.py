"""runners/edit_cli.py — the interactive ip2p entry point
(models/instructpix2pix/edit_cli.py parity: resize arithmetic, empty-edit
copy-through, one edit per instruction)."""
import dataclasses
import os
import sys

import numpy as np
import pytest
from PIL import Image

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import runners.edit_cli as cli
from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.pipeline import SDPipeline

TINY8 = dataclasses.replace(
    TINY, unet=dataclasses.replace(TINY.unet, in_channels=8), name="ip2p")


def test_fit_64_matches_reference_arithmetic():
    # edit_cli.py:87-91: long side scaled to ~resolution, both snapped to 64
    assert cli.fit_64(640, 480, 512) == (512, 384)
    assert cli.fit_64(512, 512, 512) == (512, 512)
    assert cli.fit_64(500, 500, 512) == (512, 512)
    # a 64-multiple square is a fixed point at any resolution <= its side
    assert cli.fit_64(64, 64, 16) == (64, 64)


@pytest.fixture
def tiny_pipe(monkeypatch):
    orig = SDPipeline.create.__func__
    monkeypatch.setattr(
        SDPipeline, "create",
        classmethod(lambda cls, cfg=None, rng=None, num_ddim_steps=50,
                    tokenizer=None, checkpoint_dir=None, dtype=None,
                    quantize=None: orig(cls, TINY8, num_ddim_steps=3)))


def test_edit_cli_single(tiny_pipe, tmp_path):
    inp = tmp_path / "in.png"
    Image.fromarray(
        np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    ).save(inp)
    out = tmp_path / "out.png"
    cli.main(["--input", str(inp), "--output", str(out),
              "--edit", "make it snowy", "--steps", "3",
              "--resolution", "16", "--seed", "0"])
    arr = np.asarray(Image.open(out))
    assert arr.ndim == 3 and arr.shape[-1] == 3
    assert np.isfinite(arr.astype(np.float32)).all() and arr.std() > 0


def test_edit_cli_empty_edit_copies_input(tiny_pipe, tmp_path):
    # the reference saves the RESIZED input (edit_cli.py:92-96); a 64x64
    # source at resolution 64 is a resize fixed point, so copy == source
    inp = tmp_path / "in.png"
    src = np.random.RandomState(1).randint(0, 255, (64, 64, 3), np.uint8)
    Image.fromarray(src).save(inp)
    out = tmp_path / "out.png"
    cli.main(["--input", str(inp), "--output", str(out), "--edit", "",
              "--steps", "3", "--resolution", "64"])
    np.testing.assert_array_equal(np.asarray(Image.open(out)), src)


def test_edit_cli_interactive(tiny_pipe, tmp_path, monkeypatch):
    inp = tmp_path / "in.png"
    Image.fromarray(
        np.random.RandomState(2).randint(0, 255, (16, 16, 3), np.uint8)
    ).save(inp)
    out = tmp_path / "out.png"
    import io
    monkeypatch.setattr(cli._sys, "stdin",
                        io.StringIO("make it snowy\nmake it night\n"))
    cli.main(["--input", str(inp), "--output", str(out), "--interactive",
              "--steps", "3", "--resolution", "16", "--seed", "0"])
    for n in range(2):
        assert (tmp_path / f"out_{n}.png").exists()
