"""Every family's production sweep program traced in bfloat16.

The production runner picks bf16 on TPU and f32 on CPU
(runners/run_sweep_sharded.py:426), so the whole f32 CPU suite never sees
the dtype the hardware runs — two families shipped with scan/while_loop
carry-dtype mismatches (f32 step math or f32 inner-loop losses flipping a
bf16 carry) that only crashed at 512px on the chip. Carry mismatches are
trace-time errors, so running each family at TINY shapes with bf16 forced
catches the class on CPU.
"""
import dataclasses
import json

import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.data.pie_bench import mask_encode
from pnpinversion_tpu.pipeline import SDPipeline


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    rng = np.random.RandomState(0)
    data = tmp_path_factory.mktemp("bf16") / "data"
    (data / "annotation_images" / "0_random").mkdir(parents=True)
    mapping = {}
    for i in range(2):
        rel = f"0_random/{i:06d}.jpg"
        img = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(data / "annotation_images" / rel)
        mask = np.zeros((512, 512), np.uint8)
        mask[100:200, 100:200] = 1
        mapping[f"{i:06d}"] = {
            "image_path": rel,
            "original_prompt": "a [cat] on a mat",
            "editing_prompt": "a [dog] on a mat",
            "editing_instruction": "turn the cat into a dog",
            "editing_type_id": "0",
            "blended_word": "cat dog",
            "mask": mask_encode(mask),
        }
    (data / "mapping_file.json").write_text(json.dumps(mapping))
    return str(data)


ALL_FAMILIES = [
    "directinversion+p2p",
    "null-text-inversion+p2p",
    "null-text-inversion+proximal-guidance",
    "directinversion+masactrl",
    "directinversion+pnp",
    "directinversion+pix2pix-zero",
    "edit-friendly-inversion+p2p",
    "blended-latent-diffusion",
    "edict+p2p",
    "instruct-pix2pix",
    "instruct-diffusion",
    "stylediffusion+p2p",
]


@pytest.mark.parametrize("method", ALL_FAMILIES)
def test_family_runs_in_bf16(method, mini_dataset, tmp_path, monkeypatch):
    import runners.run_sweep_sharded as runner

    tiny8 = dataclasses.replace(
        TINY, unet=dataclasses.replace(TINY.unet, in_channels=8))
    orig_create = SDPipeline.create.__func__
    monkeypatch.setattr(
        runner.SDPipeline, "create",
        classmethod(lambda cls, cfg, num_ddim_steps=50, checkpoint_dir=None,
                    dtype=None, quantize=None: orig_create(
                        cls, tiny8 if cfg.name == "ip2p" else TINY,
                        num_ddim_steps=4, dtype=jnp.bfloat16,
                        quantize=quantize)))
    argv = [
        "--data_path", mini_dataset, "--output_path", str(tmp_path / "out"),
        "--num_ddim_steps", "4", "--n_devices", "2", "--method", method,
    ]
    out_folder = method
    if method == "stylediffusion+p2p":
        from pnpinversion_tpu.models import vit
        monkeypatch.setattr(runner, "STYLEDIFFUSION_CLIP_CFG",
                            vit.ViTConfig(image_size=16, patch_size=8, width=32,
                                          layers=2, heads=2, projection_dim=16))
        monkeypatch.setattr(runner, "STYLEDIFFUSION_INNER_STEPS", 1)
        out_folder = "styleidffusion+p2p"  # reference folder typo preserved
    if method.endswith("pix2pix-zero"):
        caps = tmp_path / "captions.json"
        caps.write_text(json.dumps({"000000": "a cat on a mat",
                                    "000001": "a cat on a mat"}))
        argv += ["--caption_file", str(caps)]
    runner.main(argv)
    produced = sorted(
        (tmp_path / "out" / out_folder / "annotation_images").rglob("*.jpg"))
    assert len(produced) == 2
    for p in produced:
        arr = np.asarray(Image.open(p))
        assert np.isfinite(arr).all()
