"""MasaCtrl semantics vs the reference editor (torch-CPU oracle) + editor smoke."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.control.base import AttnSite
from pnpinversion_tpu.control.masactrl import MasaCtrlControl, MasaCtrlSpec
from pnpinversion_tpu.editors.masactrl_editor import MasaCtrlEditor
from pnpinversion_tpu.pipeline import SDPipeline

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)


def _our_attention(q, k, v, scale):
    probs = jax.nn.softmax(jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("step,expect_active", [(5, True), (2, False)])
def test_masactrl_matches_reference(step, expect_active):
    import torch

    # stub modules the oracle imports but never uses on this path; give them
    # real ModuleSpecs so importlib.util.find_spec (used by transformers'
    # lazy imports) doesn't trip over __spec__ is None
    import importlib.machinery
    import types

    for mod in ("torchvision", "torchvision.utils", "cv2"):
        if mod not in sys.modules:
            stub = types.ModuleType(mod)
            stub.__spec__ = importlib.machinery.ModuleSpec(mod, loader=None)
            if mod == "torchvision.utils":
                stub.save_image = lambda *a, **k: None
            sys.modules[mod] = stub
    sys.modules["torchvision"].utils = sys.modules["torchvision.utils"]

    sys.path.insert(0, REF)
    try:
        from models.masactrl.masactrl import MutualSelfAttentionControl
    finally:
        sys.path.remove(REF)

    B, H, S, D = 2, 2, 16, 8
    scale = D**-0.5
    rng = np.random.RandomState(0)
    q = rng.randn(2 * B, H, S, D).astype(np.float32)
    k = rng.randn(2 * B, H, S, D).astype(np.float32)
    v = rng.randn(2 * B, H, S, D).astype(np.float32)

    ref = MutualSelfAttentionControl(start_step=4, start_layer=10, total_steps=50)
    ref.cur_step = step
    ref.cur_att_layer = 24  # // 2 = layer 12 >= 10
    tq = torch.from_numpy(q.reshape(2 * B * H, S, D).copy())
    tk = torch.from_numpy(k.reshape(2 * B * H, S, D).copy())
    tv = torch.from_numpy(v.reshape(2 * B * H, S, D).copy())
    sim = torch.einsum("bid,bjd->bij", tq, tk) * scale
    attn = sim.softmax(-1)
    ref_out = ref.forward(tq, tk, tv, sim, attn, False, "up", H, scale=scale)
    ref_out = ref_out.numpy()  # (2B, S, H*D)

    site = AttnSite(index=12, place="up", resolution=4, is_cross=False, heads=H)
    ctrl = MasaCtrlControl(MasaCtrlSpec(start_step=4, start_layer=10))
    q2, k2, v2 = ctrl.qkv_hook(site, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                               {}, {}, jnp.int32(step))
    out = _our_attention(q2, k2, v2, scale)  # (2B, H, S, D)
    out = np.asarray(out).transpose(0, 2, 1, 3).reshape(2 * B, S, H * D)
    np.testing.assert_allclose(out, ref_out, atol=1e-5)

    if expect_active:
        assert not np.allclose(np.asarray(k2), k)
    else:
        np.testing.assert_array_equal(np.asarray(k2), k)


def test_masactrl_inactive_below_layer():
    site = AttnSite(index=5, place="down", resolution=4, is_cross=False, heads=2)
    ctrl = MasaCtrlControl(MasaCtrlSpec())
    q = jnp.ones((4, 2, 8, 4))
    k = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 8, 4))
    _, k2, _ = ctrl.qkv_hook(site, q, k, k, {}, {}, jnp.int32(10))
    np.testing.assert_array_equal(np.asarray(k2), np.asarray(k))


def test_masactrl_union_source_rows_unchanged():
    site = AttnSite(index=12, place="up", resolution=4, is_cross=False, heads=2)
    base = MasaCtrlControl(MasaCtrlSpec(start_step=0, start_layer=0))
    union = MasaCtrlControl(MasaCtrlSpec(start_step=0, start_layer=0, union=True))
    rng = jax.random.PRNGKey(1)
    q, k, v = jax.random.normal(rng, (3, 4, 2, 8, 4))
    scale = 0.5
    plain = _our_attention(q, k, v, scale)
    uq, uk, uv = union.qkv_hook(site, q, k, v, {}, {}, jnp.int32(5))
    union_out = _our_attention(uq, uk, uv, scale)
    # source rows (0 and B) see only their own K/V
    np.testing.assert_allclose(np.asarray(union_out[0]), np.asarray(plain[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(union_out[2]), np.asarray(plain[2]), atol=1e-5)
    assert not np.allclose(np.asarray(union_out[1]), np.asarray(plain[1]))


@pytest.mark.parametrize("method", ["ddim+masactrl", "directinversion+masactrl"])
def test_masactrl_editor_runs(method):
    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(5), num_ddim_steps=6)
    editor = MasaCtrlEditor(pipe)
    rng = np.random.RandomState(1)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    strip = editor(method, img, "a cat", "a dog", guidance_scale=7.5, step=2, layper=1)
    arr = np.asarray(strip)
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()
