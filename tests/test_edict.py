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


def test_df_primitives_track_float64():
    """Double-float ops vs numpy float64 ground truth."""
    from pnpinversion_tpu.schedulers import edict_df as df

    rng = np.random.RandomState(0)
    a64 = rng.randn(256).astype(np.float64)
    b64 = rng.randn(256).astype(np.float64)
    x = df.DF(*(jnp.asarray(v) for v in df.split_array(a64)))
    y = df.DF(*(jnp.asarray(v) for v in df.split_array(b64)))

    s = df.df_add(x, y)
    ref = a64 + b64
    err = np.abs(np.asarray(s.hi, np.float64) + np.asarray(s.lo, np.float64) - ref)
    assert err.max() < 1e-12

    c = 0.9371823467234598  # an f64 scalar with a nonzero low word
    c_hi, c_lo = df.split_scalar(c)
    p = df.df_scale(x, jnp.float32(c_hi), jnp.float32(c_lo))
    refp = a64 * c
    errp = np.abs(np.asarray(p.hi, np.float64) + np.asarray(p.lo, np.float64) - refp)
    assert errp.max() < 1e-12 * np.abs(refp).max()


def test_df_mix_unmix_exactness():
    """50 repeated mix→unmix cycles: f32 drifts, df64 stays at f64 level."""
    from pnpinversion_tpu.schedulers import edict_df as dfm

    rng = np.random.RandomState(1)
    pair64 = rng.randn(2, 1, 8, 8, 4)
    pair32 = jnp.asarray(pair64, jnp.float32)
    x0 = dfm.DF(*(jnp.asarray(v) for v in dfm.split_array(pair64[0])))
    x1 = dfm.DF(*(jnp.asarray(v) for v in dfm.split_array(pair64[1])))
    p32 = pair32
    for _ in range(50):
        p32 = edict_unmix(edict_mix(p32, 0.93), 0.93)
        m0, m1 = dfm.edict_mix_df(x0, x1, 0.93)
        x0, x1 = dfm.edict_unmix_df(m0, m1, 0.93)
    err32 = np.abs(np.asarray(p32, np.float64) - pair64).max()
    err_df = max(
        np.abs(np.asarray(x0.hi, np.float64) + np.asarray(x0.lo, np.float64)
               - pair64[0]).max(),
        np.abs(np.asarray(x1.hi, np.float64) + np.asarray(x1.lo, np.float64)
               - pair64[1]).max())
    assert err_df < 1e-10
    assert err_df < err32 / 100


def test_df_coeffs_match_f64_reference_algebra():
    """edict_df_coeffs vs a straight f64 recomputation of the step scalars."""
    from pnpinversion_tpu.schedulers.edict_df import (
        _alphas_cumprod_f64,
        edict_df_coeffs,
    )

    T, t_limit = 10, 2
    a_hi, a_lo, c_hi, c_lo = edict_df_coeffs(T, t_limit, reverse=False)
    assert a_hi.shape == (T - t_limit,)
    ac = _alphas_cumprod_f64()
    ts = (np.arange(T) * 100).round()[::-1].astype(int)[t_limit:]
    for i, t in enumerate(ts):
        a_t = ac[t]
        a_prev = ac[t - 100] if t - 100 >= 0 else ac[0]
        q = np.sqrt(a_t / a_prev)
        np.testing.assert_allclose(
            np.float64(a_hi[i]) + np.float64(a_lo[i]), 1.0 / q, rtol=1e-14)
        np.testing.assert_allclose(
            np.float64(c_hi[i]) + np.float64(c_lo[i]),
            -np.sqrt(1 - a_t) / q + np.sqrt(1 - a_prev), rtol=1e-11, atol=1e-16)


def test_coupled_roundtrip_df64_beats_f32():
    """Recon round trip (mirrors the reference recon_test,
    edict_functions.py:118-168): the df64 carry must cut the f32 error by
    orders of magnitude. Quantified values are recorded in STATUS.md."""
    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(13), num_ddim_steps=8)
    sched = make_ddim_schedule(num_steps=8)
    latent = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4)) * 0.3
    pair = jnp.stack([latent, latent], axis=0)
    ctx = jnp.concatenate([pipe.encode_prompt([""]), pipe.encode_prompt(["a cat"])],
                          axis=0)
    g = jnp.asarray(3.0)
    args = (pipe.params["unet"], sched, pipe.config.unet)

    inv32 = coupled_scan(*args, pair, ctx, g, 8, 0, reverse=True)
    rec32 = coupled_scan(*args, inv32, ctx, g, 8, 0, reverse=False)
    mse32 = float(jnp.mean((rec32 - pair) ** 2))

    hi, lo = coupled_scan(*args, pair, ctx, g, 8, 0, reverse=True,
                          precision="df64", return_lo=True)
    rec_hi, rec_lo = coupled_scan(*args, hi, ctx, g, 8, 0, reverse=False,
                                  precision="df64", pair_lo=lo, return_lo=True)
    rec_df = np.asarray(rec_hi, np.float64) + np.asarray(rec_lo, np.float64)
    mse_df = float(np.mean((rec_df - np.asarray(pair, np.float64)) ** 2))

    assert mse_df < 1e-12, (mse32, mse_df)
    assert mse_df < mse32 / 10, (mse32, mse_df)
    # df64 inversion still actually inverts
    assert float(jnp.abs(hi - pair).max()) > 1e-3


def test_edict_editor_df64_runs():
    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(14), num_ddim_steps=5)
    editor = EDICTEditor(pipe, precision="df64")
    rng = np.random.RandomState(7)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    strip = editor("edict+direct_forward", img, "a cat on a mat", "a dog on a mat")
    arr = np.asarray(strip)
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()


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
