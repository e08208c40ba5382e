"""Dataset-creation pipeline tests (SURVEY.md §2.9 dataset_creation/).

Covers: the q/k-swap == logit-copy identity behind SelfAttnShareControl,
its step/site gating, batched pair generation (reproducibility, shared
noise, sharing effect), the CLIP filter math, threshold/sort/top-k
filtering, seeds.json preparation, and the CLI end-to-end into the
training data loader.
"""
import dataclasses
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.training import dataset_creation as dc
from pnpinversion_tpu.training.data import EditPairDataset


# ------------------------------------------------------- the core identity

def test_qk_swap_equals_logit_copy(rng):
    """Replacing q,k of rows 1,3 with rows 0,2 computes the same attention
    as the reference's softmax-logit copy
    (instructpix2pix attention.py:189-194)."""
    B, H, S, D = 4, 2, 6, 8
    ks = jax.random.split(rng, 3)
    q = jax.random.normal(ks[0], (B, H, S, D))
    k = jax.random.normal(ks[1], (B, H, S, D))
    v = jax.random.normal(ks[2], (B, H, S, D))
    scale = D ** -0.5

    def attn(q, k, v):
        sim = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        return jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(sim, axis=-1), v)

    # reference: copy logits rows (0,0,2,2), keep per-row v
    sim = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    sim_copy = sim[jnp.array([0, 0, 2, 2])]
    ref = jnp.einsum("bhij,bhjd->bhid", jax.nn.softmax(sim_copy, axis=-1), v)

    idx = jnp.array([0, 0, 2, 2])
    ours = attn(q[idx], k[idx], v)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), atol=1e-5)


def test_share_control_gating(rng):
    from pnpinversion_tpu.control.base import AttnSite

    ctl = dc.SelfAttnShareControl(num_steps=10)
    q = jax.random.normal(rng, (4, 2, 5, 8))
    k = q + 1.0
    v = q + 2.0
    self_site = AttnSite(index=0, place="down", resolution=5, is_cross=False,
                         heads=2)
    cross_site = dataclasses.replace(self_site, is_cross=True)

    # thr=1.0: active at every step < num_steps-1... step 0 surely active
    tensors = {"p2p_thr": jnp.float32(1.0)}
    q2, k2, v2 = ctl.qkv_hook(self_site, q, k, v, tensors, {}, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(q2[1]), np.asarray(q[0]))
    np.testing.assert_array_equal(np.asarray(q2[3]), np.asarray(q[2]))
    np.testing.assert_array_equal(np.asarray(k2[1]), np.asarray(k[0]))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v))  # v untouched

    # thr=0.0: never active (strict >, reference :54)
    q3, _, _ = ctl.qkv_hook(self_site, q, k, v,
                            {"p2p_thr": jnp.float32(0.0)}, {}, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(q3), np.asarray(q))

    # gating boundary: thr > step/(steps-1): thr=.5 active at step 4, not 5
    q4, _, _ = ctl.qkv_hook(self_site, q, k, v,
                            {"p2p_thr": jnp.float32(0.5)}, {}, jnp.int32(4))
    assert not np.array_equal(np.asarray(q4), np.asarray(q))
    q5, _, _ = ctl.qkv_hook(self_site, q, k, v,
                            {"p2p_thr": jnp.float32(0.5)}, {}, jnp.int32(5))
    np.testing.assert_array_equal(np.asarray(q5), np.asarray(q))

    # cross-attention sites pass through
    q6, k6, v6 = ctl.qkv_hook(cross_site, q, k, v, tensors, {}, jnp.int32(0))
    assert q6 is q and k6 is k and v6 is v


# -------------------------------------------------------- pair generation

@pytest.fixture(scope="module")
def tiny_pipe():
    from pnpinversion_tpu.pipeline import SDPipeline

    return SDPipeline.create(TINY, rng=jax.random.PRNGKey(7), num_ddim_steps=4)


def test_pair_generator(tiny_pipe):
    gen = dc.PairGenerator(tiny_pipe, steps=3)
    seeds = [11, 22]
    cfgs = np.array([7.5, 9.0], np.float32)
    thrs = np.array([0.8, 0.3], np.float32)
    pairs = gen("a cat on a chair", "a dog on a chair", seeds, cfgs, thrs)
    S = TINY.vae.sample_size
    assert pairs.shape == (2, 2, S, S, 3) and pairs.dtype == np.uint8
    # caption/output branches differ (different prompts)
    assert not np.array_equal(pairs[0, 0], pairs[0, 1])
    # seeds differ
    assert not np.array_equal(pairs[0], pairs[1])
    # deterministic
    again = gen("a cat on a chair", "a dog on a chair", seeds, cfgs, thrs)
    np.testing.assert_array_equal(pairs, again)
    # the p2p threshold changes the output branch
    other = gen("a cat on a chair", "a dog on a chair", seeds, cfgs,
                np.array([0.0, 0.3], np.float32))
    assert not np.array_equal(pairs[0, 1], other[0, 1])


# ---------------------------------------------------------- CLIP filtering

def test_pair_clip_filter_scores(tiny_pipe):
    f = dc.PairClipFilter(rng=jax.random.PRNGKey(1), tiny=True,
                          tokenizer=tiny_pipe.tokenizer)
    rng = np.random.default_rng(0)
    pairs = rng.integers(0, 255, (3, 2, 24, 24, 3), dtype=np.uint8)
    sc = f.scores(pairs, "a cat", "a dog")
    for key in ("clip_sim_0", "clip_sim_1", "clip_sim_dir", "clip_sim_image"):
        assert sc[key].shape == (3,)
        assert np.all(np.abs(sc[key]) <= 1.0 + 1e-5)
    # identical images: sim_image == 1
    same = np.broadcast_to(pairs[:1, :1], pairs.shape).copy()
    sc2 = f.scores(same, "a cat", "a dog")
    np.testing.assert_allclose(sc2["clip_sim_image"], 1.0, atol=1e-4)


def test_filter_results():
    t = dc.FilterThresholds(clip_threshold=0.2, clip_dir_threshold=0.2,
                            clip_img_threshold=0.7)
    mk = lambda s0, s1, d, im: dict(clip_sim_0=s0, clip_sim_1=s1,
                                    clip_sim_dir=d, clip_sim_image=im)
    results = {
        1: mk(0.3, 0.3, 0.5, 0.9),   # pass, dir .5
        2: mk(0.3, 0.3, 0.9, 0.9),   # pass, dir .9
        3: mk(0.1, 0.3, 0.9, 0.9),   # fail sim_0
        4: mk(0.3, 0.1, 0.9, 0.9),   # fail sim_1
        5: mk(0.3, 0.3, 0.1, 0.9),   # fail dir
        6: mk(0.3, 0.3, 0.9, 0.5),   # fail image
        7: mk(0.3, 0.3, 0.7, 0.9),   # pass, dir .7
    }
    assert dc.filter_results(results, t, 10) == [2, 7, 1]
    assert dc.filter_results(results, t, 2) == [2, 7]
    assert dc.filter_results({}, t, 2) == []


# ----------------------------------------------------------- seeds.json

def test_prepare_dataset(tmp_path):
    from PIL import Image

    root = str(tmp_path)
    for name, seeds in [("0000002", [9, 3]), ("0000001", [5])]:
        os.makedirs(os.path.join(root, name))
        for s in seeds:
            for suf in ("0", "1"):
                Image.new("RGB", (8, 8)).save(
                    os.path.join(root, name, f"{s}_{suf}.jpg"))
    # a dir with no images is omitted; stray files are ignored
    os.makedirs(os.path.join(root, "0000003"))
    open(os.path.join(root, "empty.txt"), "w").close()
    path = dc.prepare_dataset(root)
    seeds = json.load(open(path))
    assert seeds == [["0000001", ["5"]], ["0000002", ["3", "9"]]]


# -------------------------------------------------------------- CLI e2e

def test_cli_end_to_end(tmp_path, monkeypatch, tiny_pipe):
    import runners.run_dataset_creation as runner
    from pnpinversion_tpu.pipeline import SDPipeline

    prompts = [
        {"caption": "a cat on a chair", "edit": "make the cat a dog",
         "output": "a dog on a chair"},
        {"caption": "a red car", "edit": "paint it blue",
         "output": "a blue car"},
    ]
    pf = tmp_path / "prompts.jsonl"
    pf.write_text("\n".join(json.dumps(p) for p in prompts))

    monkeypatch.setattr(
        SDPipeline, "create",
        classmethod(lambda cls, cfg, **kw: tiny_pipe))
    orig_filter = dc.PairClipFilter
    monkeypatch.setattr(
        dc, "PairClipFilter",
        lambda **kw: orig_filter(tiny=True, tokenizer=tiny_pipe.tokenizer))

    out = str(tmp_path / "out")
    argv = ["--out_dir", out, "--prompts_file", str(pf),
            "--steps", "3", "--n_samples", "3", "--max_out_samples", "2",
            "--batch", "2", "--seed", "0", "--dtype", "f32",
            # random weights: accept everything
            "--clip_threshold", "-1", "--clip_dir_threshold", "-1",
            "--clip_img_threshold", "-1"]
    runner.main(argv)

    for i in range(2):
        d = os.path.join(out, f"{i:07d}")
        prompt = json.load(open(os.path.join(d, "prompt.json")))
        assert prompt == prompts[i]
        meta = [json.loads(l) for l in
                open(os.path.join(d, "metadata.jsonl")).read().splitlines()]
        assert len(meta) == 2
        assert meta[0]["clip_sim_dir"] >= meta[1]["clip_sim_dir"]
        for m in meta:
            for suf in ("0", "1"):
                assert os.path.exists(os.path.join(d, f"{m['seed']}_{suf}.jpg"))
    seeds = json.load(open(os.path.join(out, "seeds.json")))
    assert len(seeds) == 2

    # restartability: a second run regenerates no prompt outputs
    # (seeds.json itself is rewritten — it is the cheap index)
    mtimes = {}
    for i in range(2):
        d = os.path.join(out, f"{i:07d}")
        for fname in os.listdir(d):
            p = os.path.join(d, fname)
            mtimes[p] = os.path.getmtime(p)
    runner.main(argv)
    for p, t in mtimes.items():
        assert os.path.getmtime(p) == t

    # the generated dataset feeds the training loader
    ds = EditPairDataset(out, split="train", splits=(1.0, 0.0, 0.0),
                         min_resize_res=16, max_resize_res=16, crop_res=16)
    assert len(ds) == 2
    item = ds.get(0, np.random.default_rng(0))
    assert item["edit"] == prompts[0]["edit"]
    assert item["cond_image"].shape == (16, 16, 3)

    # partitioning covers disjoint prompt subsets
    parts = [dc.partition_prompts(prompts, 2, p) for p in range(2)]
    assert [i for p in parts for i, _ in p] == [0, 1]
