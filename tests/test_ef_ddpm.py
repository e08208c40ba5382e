"""Edit-friendly DDPM: math parity vs the reference on a mock UNet, the
perfect-reconstruction property, and editor smoke."""
import os
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.editors.ef_editor import EditFriendlyEditor
from pnpinversion_tpu.inversion.ef_ddpm import (
    ef_forward_process,
    ef_reverse_process,
    sample_xts_from_x0,
)
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.schedulers.ddim import make_ddim_schedule

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)


def test_sample_xts_levels():
    sched = make_ddim_schedule(num_steps=10, steps_offset=1)
    x0 = jnp.ones((1, 4, 4, 4))
    xts = sample_xts_from_x0(jax.random.PRNGKey(0), sched, x0)
    assert xts.shape == (11, 1, 4, 4, 4)
    np.testing.assert_array_equal(np.asarray(xts[0]), np.asarray(x0))
    # noisiest entry has ~unit scale noise; cleanest close to x0
    assert float(jnp.abs(xts[-1]).mean()) < 3.0
    assert float(jnp.abs(xts[1] - x0).mean()) < 0.2


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_forward_process_matches_reference_math():
    """Run the reference inversion_forward_process with a mock torch 'model'
    whose unet is a closed-form function, against our scan on the same xts."""
    import torch

    sys.path.insert(0, REF)
    try:
        from models.edit_friendly_ddm import inversion_utils as ref_mod
    finally:
        sys.path.remove(REF)

    T = 10
    sched = make_ddim_schedule(num_steps=T, steps_offset=1)
    rng = np.random.RandomState(0)
    x0 = rng.randn(1, 4, 8, 8).astype(np.float32)  # torch NCHW
    xts_fixed = rng.randn(T + 1, 4, 8, 8).astype(np.float32)
    xts_fixed[0] = x0[0]

    class MockUNet:
        in_channels, sample_size = 4, 8

        def forward(self, x, timestep=None, encoder_hidden_states=None):
            out = types.SimpleNamespace()
            out.sample = 0.1 * x + 0.01 * float(timestep) / 1000.0
            return out

    class MockScheduler:
        num_inference_steps = T
        config = types.SimpleNamespace(num_train_timesteps=1000)
        alphas_cumprod = torch.from_numpy(np.asarray(sched.alphas_cumprod))
        final_alpha_cumprod = torch.tensor(float(sched.final_alpha_cumprod))
        alphas = None
        timesteps = torch.from_numpy(np.asarray(sched.timesteps, dtype=np.int64))

    class MockTokenizer:
        model_max_length = 77

        def __call__(self, *a, **k):
            return types.SimpleNamespace(input_ids=torch.zeros(1, 77, dtype=torch.long))

    class MockModel:
        unet = MockUNet()
        scheduler = MockScheduler()
        device = "cpu"
        tokenizer = MockTokenizer()

        class text_encoder:  # noqa: N801 - mimic callable attribute
            def __new__(cls, ids):
                return (torch.zeros(1, 77, 2),)

    ref_mod_sample = ref_mod.sample_xts_from_x0
    ref_mod.sample_xts_from_x0 = lambda model, x0_, num_inference_steps=T: torch.from_numpy(
        xts_fixed.copy())
    try:
        xt_ref, zs_ref, xts_ref = ref_mod.inversion_forward_process(
            MockModel(), torch.from_numpy(x0.copy()), etas=1.0, prompt="",
            cfg_scale=1.0, num_inference_steps=T)
    finally:
        ref_mod.sample_xts_from_x0 = ref_mod_sample

    # ours: same math, NHWC, mock unet via monkeypatching unet_apply
    import pnpinversion_tpu.inversion.ef_ddpm as ours

    def mock_unet_apply(params, x, t, ctx, config, *a, **k):
        scale = 1.0  # uncond path; prompt "" => cfg with identical halves
        return 0.1 * x * scale + 0.01 * t.astype(x.dtype) / 1000.0, {}

    orig = ours.unet_apply
    ours.unet_apply = mock_unet_apply
    try:
        x0_j = jnp.asarray(x0.transpose(0, 2, 3, 1))
        xts0_j = jnp.asarray(xts_fixed.transpose(0, 2, 3, 1))[:, None]
        zs, xts = ef_forward_process(
            None, sched, x0_j, jnp.zeros((1, 4, 2)), jnp.zeros((1, 4, 2)),
            jnp.asarray(1.0), None, rng=None, eta=1.0, xts0=xts0_j)
    finally:
        ours.unet_apply = orig

    zs_ref_n = zs_ref.numpy().transpose(0, 2, 3, 1)  # (T,4,8,8)->(T,8,8,4)
    np.testing.assert_allclose(np.asarray(zs[:, 0]), zs_ref_n, atol=2e-4)
    xts_ref_n = xts_ref.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(xts[:, 0]), xts_ref_n, atol=2e-4)


def test_perfect_reconstruction():
    """Reverse with the same prompt/cfg as forward reproduces x0 (skip=0).

    Exactness holds for every step except the last: the reference zeroes
    zs[0] (inversion_utils.py:174), so the final step drops a sigma_1-scale
    noise term. We check near-exactness against the re-chained xts[0] (which
    absorbs that drop when we add back sigma*z0) and looseness against x0.
    """
    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(11), num_ddim_steps=8)
    sched = make_ddim_schedule(num_steps=8, steps_offset=1)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4)) * 0.2
    cond = pipe.encode_prompt(["a cat"])
    uncond = pipe.encode_prompt([""])
    zs, xts = ef_forward_process(
        pipe.params["unet"], sched, x0, cond, uncond, jnp.asarray(1.0),
        pipe.config.unet, jax.random.PRNGKey(2))
    rec = ef_reverse_process(
        pipe.params["unet"], sched, xts[-1], zs, cond, uncond,
        jnp.asarray([1.0]), pipe.config.unet)
    # loose vs x0 (the zeroed-z0 perturbation is O(sigma_1))
    np.testing.assert_allclose(np.asarray(rec[0]), np.asarray(x0[0]), atol=0.3)
    assert float(jnp.abs(rec[0] - x0[0]).mean()) < 0.06

    # exact when z0 is kept: recompute z0 from the re-chained trajectory
    from pnpinversion_tpu.schedulers.ddim import ddim_variance
    from pnpinversion_tpu.models.unet import unet_apply
    from pnpinversion_tpu.schedulers.ddim import classifier_free_guidance

    t1 = sched.timesteps[-1]
    xt1 = xts[1]
    ctx = jnp.concatenate([uncond, cond], axis=0)
    eps2, _ = unet_apply(pipe.params["unet"], jnp.concatenate([xt1, xt1]), t1,
                         ctx, pipe.config.unet)
    eps = classifier_free_guidance(eps2[:1], eps2[1:], 1.0)
    a_t = sched.alpha_at(t1)
    a_prev = sched.alpha_at(t1 - sched.step_ratio)
    var = ddim_variance(sched, t1)
    mu = a_prev**0.5 * (xt1 - (1 - a_t) ** 0.5 * eps) / a_t**0.5 + (
        1 - a_prev - var) ** 0.5 * eps
    z0 = (xts[0] - mu) / var**0.5
    zs_full = zs.at[0].set(z0)
    rec2 = ef_reverse_process(
        pipe.params["unet"], sched, xts[-1], zs_full, cond, uncond,
        jnp.asarray([1.0]), pipe.config.unet)
    np.testing.assert_allclose(np.asarray(rec2[0]), np.asarray(xts[0, 0]), atol=2e-2)


def test_ef_editor_runs():
    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(12), num_ddim_steps=8)
    editor = EditFriendlyEditor(pipe)
    rng = np.random.RandomState(4)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    strip = editor("edit-friendly-inversion+p2p", img, "a cat on a mat",
                   "a dog on a mat", skip=2)
    arr = np.asarray(strip)
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()
