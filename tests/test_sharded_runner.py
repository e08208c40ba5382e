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
                    dtype=None, quantize=None: orig_create(cls, TINY, num_ddim_steps=4)))
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


def test_sharded_sweep_skips_unreadable_input(mini_dataset, tmp_path, monkeypatch):
    """A corrupt input image is logged and dropped; the sweep still finishes
    the readable items (a crash would wedge every restart at the same spot)."""
    import json as _json

    import runners.run_sweep_sharded as runner

    bad = os.path.join(mini_dataset, "annotation_images", "0_random", "000001.jpg")
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    orig_create = SDPipeline.create.__func__
    monkeypatch.setattr(
        runner.SDPipeline, "create",
        classmethod(lambda cls, cfg, num_ddim_steps=50, checkpoint_dir=None,
                    dtype=None, quantize=None: orig_create(cls, TINY, num_ddim_steps=4)))
    out = tmp_path / "out"
    log = tmp_path / "run.jsonl"
    runner.main([
        "--data_path", mini_dataset, "--output_path", str(out),
        "--num_ddim_steps", "4", "--n_devices", "2", "--run_log", str(log),
    ])
    produced = sorted((out / "directinversion+p2p" / "annotation_images").rglob("*.jpg"))
    assert len(produced) == 2  # the two readable items
    events = [_json.loads(l) for l in open(log)]
    errs = [e for e in events if e["event"] == "image_error"]
    assert len(errs) == 1 and errs[0]["key"] == "000001"


def test_batched_masactrl_matches_editor():
    """Batched path == per-image editor panels (same math, vmap added)."""
    from pnpinversion_tpu.editors.masactrl_editor import MasaCtrlEditor
    from pnpinversion_tpu.parallel.sweep import BatchedMasaCtrl, make_dp_mesh

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(21), num_ddim_steps=4)
    size = pipe.config.vae.sample_size
    rng = np.random.RandomState(3)
    imgs = (rng.rand(2, size, size, 3) * 255).astype(np.uint8)
    prompts = ["a dog", "a red dog"]

    editor = MasaCtrlEditor(pipe)
    ref_panels = []
    for i in range(2):
        strip = np.asarray(editor("directinversion+masactrl", imgs[i], "",
                                  prompts[i]))
        ref_panels.append(strip[:, 2 * size :])  # [recon | edit]

    sweep = BatchedMasaCtrl(pipe, make_dp_mesh(2))
    cond = np.stack([np.asarray(pipe.encode_prompt(["", p])) for p in prompts])
    recon, edit = sweep.edit_batch(True, np.asarray(imgs), cond, 7.5)
    for i in range(2):
        got = np.concatenate([np.asarray(recon[i]), np.asarray(edit[i])], axis=1)
        diff = np.abs(got.astype(int) - ref_panels[i].astype(int))
        assert diff.max() <= 2, diff.max()  # uint8 rounding headroom


@pytest.mark.parametrize("method", ["ddim+p2p", "negative-prompt-inversion+p2p",
                                    "null-text-inversion+p2p",
                                    "negative-prompt-inversion+proximal-guidance",
                                    "null-text-inversion+proximal-guidance"])
def test_batched_p2p_variants_match_editor(method):
    """Batched inversion-variant paths == per-image editor panels.

    Covers the row-0-is-the-recon-pass algebra: the batched path runs ONE
    batch-2 scan per image where the editor runs separate recon+edit scans.
    """
    import jax.numpy as jnp

    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.parallel.sweep import (
        BatchedDirectInversionP2P,
        make_dp_mesh,
    )

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(7), num_ddim_steps=4)
    size = pipe.config.vae.sample_size
    rng = np.random.RandomState(11)
    imgs = (rng.rand(2, size, size, 3) * 255).astype(np.uint8)
    src, tar = "a cat on a mat", "a dog on a mat"

    editor = P2PEditor(pipe)
    prox_kw = dict(proximal="l0", quantile=0.75, use_inversion_guidance=True,
                   recon_lr=1, recon_t=400)
    fn = {"ddim+p2p": editor.edit_ddim,
          "negative-prompt-inversion+p2p": editor.edit_negative_prompt,
          "null-text-inversion+p2p": editor.edit_null_text,
          "negative-prompt-inversion+proximal-guidance":
              editor.edit_negative_prompt,
          "null-text-inversion+proximal-guidance":
              editor.edit_null_text_proximal}[method]
    kw = {"null-text-inversion+p2p": {"num_inner_steps": 3},
          "negative-prompt-inversion+proximal-guidance": prox_kw,
          "null-text-inversion+proximal-guidance":
              dict(prox_kw, num_inner_steps=3)}.get(method, {})
    ref_panels = [np.asarray(fn(imgs[i], src, tar, **kw))[:, 2 * size:]
                  for i in range(2)]

    ctrl, tensors = make_p2p_control(
        [src, tar], pipe.tokenizer, num_steps=4,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=False, num_lb_slots=pipe.num_lb_slots,
        lb_res=pipe.lb_res, latent_size=pipe.latent_size)
    sweep = BatchedDirectInversionP2P(pipe, make_dp_mesh(2), num_inner_steps=3)
    cond = np.stack([np.asarray(pipe.encode_prompt([src, tar]))] * 2)
    if method.startswith("negative-prompt-inversion"):
        uncond_b = np.stack([np.stack([c[0], c[0]]) for c in cond])
    else:
        uncond_b = np.stack([np.asarray(pipe.encode_prompt(["", ""]))] * 2)
    tb = jax.tree.map(lambda x: jnp.stack([x, x]), tensors)
    recon, edit = sweep.edit_batch(
        ctrl.spec, np.asarray(imgs), jnp.asarray(cond), jnp.asarray(uncond_b),
        7.5, tb, method=method)
    for i in range(2):
        got = np.concatenate([np.asarray(recon[i]), np.asarray(edit[i])], axis=1)
        diff = np.abs(got.astype(int) - ref_panels[i].astype(int))
        assert diff.max() <= 2, (method, diff.max())


@pytest.mark.parametrize("method", ["ddim+pix2pix-zero",
                                    "directinversion+pix2pix-zero"])
def test_sharded_sweep_pix2pix_zero(method, mini_dataset, tmp_path, monkeypatch):
    import runners.run_sweep_sharded as runner

    orig_create = SDPipeline.create.__func__
    monkeypatch.setattr(
        runner.SDPipeline, "create",
        classmethod(lambda cls, cfg, num_ddim_steps=50, checkpoint_dir=None,
                    dtype=None, quantize=None: orig_create(cls, TINY, num_ddim_steps=4)))
    captions = {f"{i:06d}": "a photo of a cat" for i in range(3)}
    cap_file = tmp_path / "captions.json"
    cap_file.write_text(json.dumps(captions))
    out = tmp_path / "out"
    runner.main([
        "--data_path", mini_dataset, "--output_path", str(out),
        "--num_ddim_steps", "4", "--n_devices", "2", "--method", method,
        "--caption_file", str(cap_file),
    ])
    produced = sorted((out / method / "annotation_images").rglob("*.jpg"))
    assert len(produced) == 3
    for p in produced:
        arr = np.asarray(Image.open(p))
        assert arr.shape == (16, 64, 3)
        assert np.isfinite(arr).all()


def test_batched_ef_matches_editor():
    """Batched EF path == per-image editor panels (same math, vmap added)."""
    import jax.numpy as jnp

    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.editors.ef_editor import EditFriendlyEditor
    from pnpinversion_tpu.parallel.sweep import BatchedEditFriendly, make_dp_mesh

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(12), num_ddim_steps=4)
    size = pipe.config.vae.sample_size
    rng = np.random.RandomState(5)
    imgs = (rng.rand(2, size, size, 3) * 255).astype(np.uint8)
    src, tar = "a cat on a mat", "a dog on a mat"  # equal word count: Replace

    editor = EditFriendlyEditor(pipe)
    ref_panels = []
    for i in range(2):
        strip = np.asarray(editor("edit-friendly-inversion+p2p", imgs[i], src,
                                  tar, skip=2))
        ref_panels.append(strip[:, 2 * size :])  # [source row | edit row]

    sweep = BatchedEditFriendly(pipe, make_dp_mesh(2), skip=2)
    ctrl, tensors = make_p2p_control(
        [src, tar], pipe.tokenizer, num_steps=4,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=True, num_lb_slots=pipe.num_lb_slots,
        lb_res=pipe.lb_res, latent_size=pipe.latent_size,
        self_edit_max_seq=16 * 16)
    cond = np.stack([np.asarray(pipe.encode_prompt([src, tar]))] * 2)
    tb = jax.tree.map(lambda x: jnp.stack([x, x]), tensors)
    recon, edit = sweep.edit_batch(ctrl.spec, np.asarray(imgs), cond,
                                   1.0, 7.5, tb)
    for i in range(2):
        got = np.concatenate([np.asarray(recon[i]), np.asarray(edit[i])], axis=1)
        diff = np.abs(got.astype(int) - ref_panels[i].astype(int))
        assert diff.max() <= 2, diff.max()


@pytest.mark.parametrize("method", [
    "ablation_directinversion_08+p2p",
    "ablation_directinversion_interval_2+p2p",
    "ablation_directinversion_add-source+p2p",
    "ablation_directinversion_add-target+p2p",
    "ablation_null-latent-inversion+p2p",
    "ablation_null-text-inversion_single_branch+p2p"])
def test_batched_ablations_match_editor(method):
    """Group 5-8 ablation variants through the batched path == the per-image
    editor (explicit offsets replay + controlled edit; recon = edit row 0)."""
    import jax.numpy as jnp

    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.parallel.sweep import (
        BatchedDirectInversionP2P,
        make_dp_mesh,
    )

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(19), num_ddim_steps=4)
    size = pipe.config.vae.sample_size
    rng = np.random.RandomState(23)
    imgs = (rng.rand(2, size, size, 3) * 255).astype(np.uint8)
    src, tar = "a cat on a mat", "a dog on a mat"

    editor = P2PEditor(pipe)
    ref_panels = [np.asarray(editor(method, imgs[i], src, tar))[:, 2 * size:]
                  for i in range(2)]

    ctrl, tensors = make_p2p_control(
        [src, tar], pipe.tokenizer, num_steps=4,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=False, num_lb_slots=pipe.num_lb_slots,
        lb_res=pipe.lb_res, latent_size=pipe.latent_size)
    sweep = BatchedDirectInversionP2P(pipe, make_dp_mesh(2))
    cond = np.stack([np.asarray(pipe.encode_prompt([src, tar]))] * 2)
    uncond_b = np.stack([np.asarray(pipe.encode_prompt(["", ""]))] * 2)
    tb = jax.tree.map(lambda x: jnp.stack([x, x]), tensors)
    recon, edit = sweep.edit_batch(
        ctrl.spec, np.asarray(imgs), jnp.asarray(cond), jnp.asarray(uncond_b),
        7.5, tb, method=method)
    for i in range(2):
        got = np.concatenate([np.asarray(recon[i]), np.asarray(edit[i])], axis=1)
        diff = np.abs(got.astype(int) - ref_panels[i].astype(int))
        assert diff.max() <= 2, (method, diff.max())


def test_batched_step_ablation_matches_editor():
    """Group-7 step-count ablation == the flagship editor run at that step
    count (the method string only changes the schedule length + out folder,
    reference evaluate.py:167-170)."""
    import jax.numpy as jnp

    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.parallel.sweep import (
        BatchedDirectInversionP2P,
        make_dp_mesh,
    )

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(43), num_ddim_steps=2)
    size = pipe.config.vae.sample_size
    rng = np.random.RandomState(37)
    imgs = (rng.rand(2, size, size, 3) * 255).astype(np.uint8)
    src, tar = "a cat on a mat", "a dog on a mat"

    editor = P2PEditor(pipe)
    ref_panels = [np.asarray(editor("directinversion+p2p", imgs[i], src,
                                    tar))[:, 2 * size:]
                  for i in range(2)]

    assert BatchedDirectInversionP2P.supports("ablation_directinversion_step_2+p2p")
    assert BatchedDirectInversionP2P.step_ablation_steps(
        "ablation_directinversion_step_2+p2p") == 2
    ctrl, tensors = make_p2p_control(
        [src, tar], pipe.tokenizer, num_steps=2,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=False, num_lb_slots=pipe.num_lb_slots,
        lb_res=pipe.lb_res, latent_size=pipe.latent_size)
    sweep = BatchedDirectInversionP2P(pipe, make_dp_mesh(2))
    cond = np.stack([np.asarray(pipe.encode_prompt([src, tar]))] * 2)
    uncond_b = np.stack([np.asarray(pipe.encode_prompt(["", ""]))] * 2)
    tb = jax.tree.map(lambda x: jnp.stack([x, x]), tensors)
    recon, edit = sweep.edit_batch(
        ctrl.spec, np.asarray(imgs), jnp.asarray(cond), jnp.asarray(uncond_b),
        7.5, tb, method="ablation_directinversion_step_2+p2p")
    for i in range(2):
        got = np.concatenate([np.asarray(recon[i]), np.asarray(edit[i])], axis=1)
        diff = np.abs(got.astype(int) - ref_panels[i].astype(int))
        assert diff.max() <= 2, diff.max()


def test_sharded_sweep_step_ablation_folder(mini_dataset, tmp_path, monkeypatch):
    """`--method ablation_directinversion_step_20+p2p` bakes 20 steps into
    the pipeline and writes the registry's expected folder (VERDICT r2 #3)."""
    import runners.run_sweep_sharded as runner
    from pnpinversion_tpu.evaluation.evaluate import all_tgt_image_folders

    seen_steps = []
    orig_create = SDPipeline.create.__func__

    def fake_create(cls, cfg, num_ddim_steps=50, checkpoint_dir=None,
                    dtype=None, quantize=None):
        seen_steps.append(num_ddim_steps)
        return orig_create(cls, TINY, num_ddim_steps=num_ddim_steps)

    monkeypatch.setattr(runner.SDPipeline, "create", classmethod(fake_create))
    out = tmp_path / "out"
    runner.main([
        "--data_path", mini_dataset, "--output_path", str(out),
        "--n_devices", "2", "--method", "ablation_directinversion_step_20+p2p",
    ])
    assert seen_steps == [20]
    folder = out / "ablation_directinversion_step_20+p2p" / "annotation_images"
    produced = sorted(folder.rglob("*.jpg"))
    assert len(produced) == 3
    # the eval registry reads exactly this folder under the suffixless key
    reg = all_tgt_image_folders(str(out))
    assert reg["7_ablation_directinversion_step_20"] == str(folder)


def test_batched_guidance_grid_matches_editor():
    """Group-3 guidance-grid variant through the batched path == editor
    (CFG inversion at the grid's inverse scale, edit at the forward scale)."""
    import jax.numpy as jnp

    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.parallel.sweep import (
        BatchedDirectInversionP2P,
        make_dp_mesh,
    )

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(17), num_ddim_steps=4)
    size = pipe.config.vae.sample_size
    rng = np.random.RandomState(13)
    imgs = (rng.rand(2, size, size, 3) * 255).astype(np.uint8)
    src, tar = "a cat on a mat", "a dog on a mat"

    editor = P2PEditor(pipe)
    ref_panels = [np.asarray(editor("directinversion+p2p_guidance_1_5",
                                    imgs[i], src, tar))[:, 2 * size:]
                  for i in range(2)]

    ctrl, tensors = make_p2p_control(
        [src, tar], pipe.tokenizer, num_steps=4,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=False, num_lb_slots=pipe.num_lb_slots,
        lb_res=pipe.lb_res, latent_size=pipe.latent_size)
    sweep = BatchedDirectInversionP2P(pipe, make_dp_mesh(2))
    cond = np.stack([np.asarray(pipe.encode_prompt([src, tar]))] * 2)
    uncond_b = np.stack([np.asarray(pipe.encode_prompt(["", ""]))] * 2)
    tb = jax.tree.map(lambda x: jnp.stack([x, x]), tensors)
    recon, edit = sweep.edit_batch(
        ctrl.spec, np.asarray(imgs), jnp.asarray(cond), jnp.asarray(uncond_b),
        5.0, tb, method="directinversion+p2p_guidance_1_5")
    for i in range(2):
        got = np.concatenate([np.asarray(recon[i]), np.asarray(edit[i])], axis=1)
        diff = np.abs(got.astype(int) - ref_panels[i].astype(int))
        assert diff.max() <= 2, diff.max()


def test_tp_sharded_p2p_matches_dp():
    """(dp=2, tp=2) tensor-parallel sweep == the plain dp path (same images,
    UNet matmul output dims sharded over tp; SURVEY §2.14 optional TP)."""
    import jax.numpy as jnp

    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.parallel.sweep import (
        BatchedDirectInversionP2P,
        make_dp_mesh,
        make_dp_tp_mesh,
    )

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(41), num_ddim_steps=4)
    size = pipe.config.vae.sample_size
    rng = np.random.RandomState(31)
    imgs = (rng.rand(2, size, size, 3) * 255).astype(np.uint8)
    src, tar = "a cat on a mat", "a dog on a mat"
    ctrl, tensors = make_p2p_control(
        [src, tar], pipe.tokenizer, num_steps=4,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=False, num_lb_slots=pipe.num_lb_slots,
        lb_res=pipe.lb_res, latent_size=pipe.latent_size)
    cond = np.stack([np.asarray(pipe.encode_prompt([src, tar]))] * 2)
    uncond = np.asarray(pipe.encode_prompt(["", ""]))
    tb = jax.tree.map(lambda x: jnp.stack([x, x]), tensors)

    outs = {}
    for name, mesh in [("dp", make_dp_mesh(2)),
                       ("tp", make_dp_tp_mesh(4, tp=2))]:
        sweep = BatchedDirectInversionP2P(pipe, mesh)
        recon, edit = sweep.edit_batch(
            ctrl.spec, np.asarray(imgs), jnp.asarray(cond), jnp.asarray(uncond),
            7.5, tb)
        outs[name] = (np.asarray(recon), np.asarray(edit))
    for a, b in zip(outs["dp"], outs["tp"]):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 2


def test_batched_stylediffusion_matches_editor():
    """Batched StyleDiffusion path == per-image editor panels (the mapper
    training itself runs vmapped/dp-sharded)."""
    import jax.numpy as jnp

    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.editors.stylediffusion_editor import StyleDiffusionEditor
    from pnpinversion_tpu.models import vit
    from pnpinversion_tpu.parallel.sweep import (
        BatchedStyleDiffusion,
        make_dp_mesh,
    )

    tiny_clip = vit.ViTConfig(image_size=16, patch_size=8, width=32, layers=2,
                              heads=2, projection_dim=16)
    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(30), num_ddim_steps=4)
    size = pipe.config.vae.sample_size
    rng = np.random.RandomState(9)
    imgs = (rng.rand(2, size, size, 3) * 255).astype(np.uint8)
    src, tar = "a cat on a mat", "a dog on a mat"

    editor = StyleDiffusionEditor(pipe, clip_vision_cfg=tiny_clip)
    ref_panels = [np.asarray(editor("stylediffusion+p2p", imgs[i], src, tar,
                                    num_inner_steps=2))[:, 2 * size:]
                  for i in range(2)]

    sweep = BatchedStyleDiffusion(pipe, clip_vision_cfg=tiny_clip,
                                  mesh=make_dp_mesh(2), num_inner_steps=2)
    ctrl, tensors = make_p2p_control(
        [src, tar], pipe.tokenizer, num_steps=4,
        cross_replace_steps={"default_": 0.6}, self_replace_steps=0.6,
        is_replace_controller=False, num_lb_slots=pipe.num_lb_slots,
        lb_res=pipe.lb_res, latent_size=pipe.latent_size)
    cond_src = np.stack([np.asarray(pipe.encode_prompt([src]))] * 2)
    cond2 = np.stack([np.asarray(pipe.encode_prompt([src, tar]))] * 2)
    tb = jax.tree.map(lambda x: jnp.stack([x, x]), tensors)
    recon, edit = sweep.edit_batch(ctrl.spec, np.asarray(imgs),
                                   jnp.asarray(cond_src), jnp.asarray(cond2),
                                   tb, 7.5)
    for i in range(2):
        got = np.concatenate([np.asarray(recon[i]), np.asarray(edit[i])], axis=1)
        diff = np.abs(got.astype(int) - ref_panels[i].astype(int))
        assert diff.max() <= 2, diff.max()


def test_sharded_sweep_stylediffusion(mini_dataset, tmp_path, monkeypatch):
    import runners.run_sweep_sharded as runner
    from pnpinversion_tpu.models import vit

    orig_create = SDPipeline.create.__func__
    monkeypatch.setattr(
        runner.SDPipeline, "create",
        classmethod(lambda cls, cfg, num_ddim_steps=50, checkpoint_dir=None,
                    dtype=None, quantize=None: orig_create(cls, TINY, num_ddim_steps=4)))
    monkeypatch.setattr(runner, "STYLEDIFFUSION_CLIP_CFG",
                        vit.ViTConfig(image_size=16, patch_size=8, width=32,
                                      layers=2, heads=2, projection_dim=16))
    monkeypatch.setattr(runner, "STYLEDIFFUSION_INNER_STEPS", 1)
    out = tmp_path / "out"
    runner.main([
        "--data_path", mini_dataset, "--output_path", str(out),
        "--num_ddim_steps", "4", "--n_devices", "2",
        "--method", "stylediffusion+p2p",
    ])
    # the reference's output-folder typo is preserved
    produced = sorted((out / "styleidffusion+p2p" / "annotation_images").rglob("*.jpg"))
    assert len(produced) == 3
    for p in produced:
        arr = np.asarray(Image.open(p))
        assert arr.shape == (16, 64, 3)
        assert np.isfinite(arr).all()


@pytest.mark.parametrize("method", ["ddim+p2p", "negative-prompt-inversion+p2p",
                                    "null-text-inversion+p2p",
                                    "negative-prompt-inversion+proximal-guidance",
                                    "null-text-inversion+proximal-guidance",
                                    "directinversion+p2p_guidance_75_25",
                                    "directinversion+masactrl", "ddim+masactrl",
                                    "directinversion+pnp", "ddim+pnp",
                                    "edit-friendly-inversion+p2p",
                                    "blended-latent-diffusion",
                                    "edict+direct_forward", "edict+p2p",
                                    "instruct-pix2pix", "instruct-diffusion"])
def test_sharded_sweep_more_families(method, mini_dataset, tmp_path, monkeypatch):
    """VERDICT r1 next #8: the remaining PIE-Bench families through the same
    vmap+shard sweep path, on the virtual mesh."""
    import dataclasses

    import runners.run_sweep_sharded as runner

    # instruct models need the 8-in-channel UNet (latent + image-cond concat)
    tiny8 = dataclasses.replace(
        TINY, unet=dataclasses.replace(TINY.unet, in_channels=8))
    orig_create = SDPipeline.create.__func__
    monkeypatch.setattr(
        runner.SDPipeline, "create",
        classmethod(lambda cls, cfg, num_ddim_steps=50, checkpoint_dir=None,
                    dtype=None, quantize=None: orig_create(
                        cls, tiny8 if cfg.name == "ip2p" else TINY,
                        num_ddim_steps=4)))
    out = tmp_path / "out"
    runner.main([
        "--data_path", mini_dataset, "--output_path", str(out),
        "--num_ddim_steps", "4", "--n_devices", "2", "--method", method,
    ])
    produced = sorted((out / method / "annotation_images").rglob("*.jpg"))
    assert len(produced) == 3
    for p in produced:
        arr = np.asarray(Image.open(p))
        assert arr.shape == (16, 64, 3)
        assert np.isfinite(arr).all()


def test_param_shardings_specs():
    """TP placement rules: shard out-dims divisible by tp, replicate the rest."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from pnpinversion_tpu.parallel.sweep import (
        make_dp_mesh,
        make_dp_tp_mesh,
        param_shardings,
    )

    params = {"lin": jnp.zeros((8, 16)), "conv": jnp.zeros((3, 3, 8, 32)),
              "odd": jnp.zeros((8, 3)), "bias": jnp.zeros((16,))}
    tp_mesh = make_dp_tp_mesh(4, tp=2)
    sh = param_shardings(tp_mesh, params)
    assert sh["lin"].spec == P(None, "tp")
    assert sh["conv"].spec == P(None, None, None, "tp")
    assert sh["odd"].spec == P()   # 3 not divisible by tp
    assert sh["bias"].spec == P()  # 1D replicated
    # dp-only mesh: everything replicated
    sh2 = param_shardings(make_dp_mesh(2), params)
    assert all(s.spec == P() for s in jax.tree.leaves(
        jax.tree.map(lambda s: s, sh2, is_leaf=lambda x: hasattr(x, "spec"))))
