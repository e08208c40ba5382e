"""EDICT: exact invertibility of steps/mixing, round-trip property, editor smoke."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.control.edict_p2p import make_edict_p2p_tensors
from pnpinversion_tpu.editors.edict_editor import EDICTEditor, coupled_scan
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.schedulers.ddim import make_ddim_schedule
from pnpinversion_tpu.schedulers.edict import (
    edict_forward_step,
    edict_mix,
    edict_reverse_step,
    edict_unmix,
)
from pnpinversion_tpu.utils.tokenizer import SimpleWordTokenizer


def test_step_inverse():
    sched = make_ddim_schedule(num_steps=10)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 4))
    for i in [0, 5, 9]:
        t = sched.timesteps[i]
        fwd = edict_forward_step(sched, eps, t, x)
        back = edict_reverse_step(sched, eps, t, fwd)
        np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)
        inv = edict_reverse_step(sched, eps, t, x)
        np.testing.assert_allclose(
            np.asarray(edict_forward_step(sched, eps, t, inv)), np.asarray(x), atol=1e-5)


def test_mix_inverse():
    pair = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 4, 4, 4))
    mixed = edict_mix(pair, 0.93)
    np.testing.assert_allclose(np.asarray(edict_unmix(mixed, 0.93)), np.asarray(pair),
                               atol=1e-5)
    assert not np.allclose(np.asarray(mixed), np.asarray(pair))


def test_coupled_roundtrip():
    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(13), num_ddim_steps=8)
    sched = make_ddim_schedule(num_steps=8)
    latent = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4)) * 0.3
    pair = jnp.stack([latent, latent], axis=0)
    ctx = jnp.concatenate([pipe.encode_prompt([""]), pipe.encode_prompt(["a cat"])], axis=0)
    g = jnp.asarray(3.0)
    inv = coupled_scan(pipe.params["unet"], sched, pipe.config.unet, pair, ctx, g,
                       8, 0, reverse=True)
    rec = coupled_scan(pipe.params["unet"], sched, pipe.config.unet, inv, ctx, g,
                       8, 0, reverse=False)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(pair), atol=5e-3)
    # the inversion actually moved the latents
    assert float(jnp.abs(inv - pair).max()) > 1e-3


def test_edit_alignment_tensors():
    tok = SimpleWordTokenizer()
    t = make_edict_p2p_tensors("a cat on a mat", "a dog on a mat", tok)
    mask = np.asarray(t["edit_mask"])
    idx = np.asarray(t["edit_indices"])
    assert mask[1] == 1 and idx[1] == 1  # 'a' kept
    assert mask[3] == 1 and idx[3] == 3  # 'on' kept
    assert mask[2] == 1 and idx[2] == 2  # same-length replace cat->dog


@pytest.mark.parametrize("method", ["edict+direct_forward", "edict+p2p"])
def test_edict_editor_runs(method):
    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(14), num_ddim_steps=5)
    editor = EDICTEditor(pipe)
    rng = np.random.RandomState(6)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    strip = editor(method, img, "a cat on a mat", "a dog on a mat")
    arr = np.asarray(strip)
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()
