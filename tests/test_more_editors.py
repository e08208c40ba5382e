"""Smoke + property tests for BLD, instruct editors, pix2pix-zero, and the
batched dp-sharded sweep — all on the tiny config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.pipeline import SDPipeline


@pytest.fixture(scope="module")
def pipe():
    return SDPipeline.create(TINY, rng=jax.random.PRNGKey(21), num_ddim_steps=6)


@pytest.fixture(scope="module")
def image(pipe):
    rng = np.random.RandomState(8)
    size = pipe.config.vae.sample_size
    return (rng.rand(size, size, 3) * 255).astype(np.uint8)


def test_bld_editor(pipe, image):
    from pnpinversion_tpu.editors.bld_editor import BlendedLatentDiffusionEditor

    editor = BlendedLatentDiffusionEditor(pipe)
    size = pipe.config.vae.sample_size
    mask = np.zeros((size, size), np.uint8)
    mask[4:12, 4:12] = 1
    strip = editor("blended-latent-diffusion", image, mask, "a red cat")
    arr = np.asarray(strip)
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()


@pytest.mark.parametrize("method", ["instruct-pix2pix", "instruct-diffusion"])
def test_instruct_editor(image, method):
    import dataclasses

    from pnpinversion_tpu.editors.instruct_editor import InstructEditor

    # edit-conditioned UNet: 8 input channels (latent + image conditioning)
    cfg = dataclasses.replace(
        TINY, unet=dataclasses.replace(TINY.unet, in_channels=8))
    ipipe = SDPipeline.create(cfg, rng=jax.random.PRNGKey(22), num_ddim_steps=6)
    editor = InstructEditor(ipipe)
    strip = editor(method, image, "make the cat red", steps=6)
    size = ipipe.config.vae.sample_size
    arr = np.asarray(strip)
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()


def test_kdiffusion_sigmas(pipe):
    from pnpinversion_tpu.sampling.kdiffusion import get_sigmas, sigma_to_t

    sig = get_sigmas(pipe.schedule, 10)
    s = np.asarray(sig)
    assert s.shape == (11,)
    assert s[-1] == 0 and (np.diff(s[:-1]) < 0).all()
    # sigma_to_t inverts the sigma table at grid points
    t = float(sigma_to_t(pipe.schedule, sig[0]))
    assert t == pytest.approx(999.0, abs=1.0)


def test_pix2pix_zero_editor(pipe, image):
    from pnpinversion_tpu.editors.pix2pix_zero_editor import Pix2PixZeroEditor

    editor = Pix2PixZeroEditor(pipe)
    strip = editor("directinversion+pix2pix-zero", image, "a cat", "a dog",
                   caption="a photo of a cat")
    size = pipe.config.vae.sample_size
    arr = np.asarray(strip)
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()


def test_p2z_regularization_reduces_kl():
    from pnpinversion_tpu.inversion.pix2pix_zero import kl_divergence, regularize_noise

    eps = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4)) * 2.0 + 0.5
    out = regularize_noise(eps, jax.random.PRNGKey(1))
    assert float(kl_divergence(out)) < float(kl_divergence(eps))


def test_batched_sweep_matches_single(pipe, image):
    """dp-sharded batched edit == per-image edit (same compiled math)."""
    from pnpinversion_tpu.control.p2p import make_p2p_control
    from pnpinversion_tpu.parallel.sweep import BatchedDirectInversionP2P, make_dp_mesh

    n_dev = min(4, len(jax.devices()))
    mesh = make_dp_mesh(n_dev)
    sweep = BatchedDirectInversionP2P(pipe, mesh)
    ctrl, tensors = make_p2p_control(
        ["a cat", "a dog"], pipe.tokenizer, num_steps=pipe.schedule.num_steps,
        num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
        latent_size=pipe.latent_size)

    N = n_dev
    images = np.stack([image] * N)
    cond1 = pipe.encode_prompt(["a cat", "a dog"])
    uncond = pipe.encode_prompt(["", ""])
    cond = jnp.stack([cond1] * N)
    tensors_b = jax.tree.map(lambda a: jnp.stack([a] * N), tensors)
    recon, edit = sweep.edit_batch(ctrl.spec, jnp.asarray(images), cond, uncond,
                                   7.5, tensors_b)
    assert recon.shape == images.shape and edit.shape == images.shape
    # identical inputs -> identical outputs across the sharded batch
    np.testing.assert_array_equal(np.asarray(edit[0]), np.asarray(edit[-1]))
