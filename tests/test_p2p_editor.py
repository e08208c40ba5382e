"""End-to-end P2P editor on the tiny config: output contract, determinism,
and the DirectInversion perfect-reconstruction invariant."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.editors.p2p_editor import P2PEditor
from pnpinversion_tpu.inversion.ddim_inversion import (
    ddim_invert_loop,
    direct_inversion_offsets,
)
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.sampling.p2p_forward import guidance_forward

SRC = "a cat on a mat"
TAR = "a silver cat sculpture on a mat"


@pytest.fixture(scope="module")
def pipe():
    return SDPipeline.create(TINY, rng=jax.random.PRNGKey(7), num_ddim_steps=8)


@pytest.fixture(scope="module")
def image(pipe):
    rng = np.random.RandomState(3)
    size = pipe.config.vae.sample_size
    return (rng.rand(size, size, 3) * 255).astype(np.uint8)


def test_direct_inversion_perfect_reconstruction(pipe, image):
    """The paper's central property: adding the recorded offsets back to the
    source branch reproduces the source latent trajectory exactly
    (inversion.py:386-389 + p2p_guidance_forward.py:113-114)."""
    from pnpinversion_tpu.models.vae import image_to_latent

    latent = image_to_latent(pipe.params["vae"], jnp.asarray(image), pipe.config.vae)
    cond = pipe.encode_prompt([SRC, TAR])
    uncond = pipe.encode_prompt(["", ""])
    traj = ddim_invert_loop(pipe.params["unet"], pipe.schedule, latent, cond[:1],
                            pipe.config.unet)
    context = jnp.concatenate([uncond, cond], axis=0)
    g = jnp.asarray(7.5)
    noise_loss, final = direct_inversion_offsets(
        pipe.params["unet"], pipe.schedule, traj, context, g, pipe.config.unet)
    # offsets force the replay onto the inversion trajectory (exactly)
    np.testing.assert_allclose(np.asarray(final[0]), np.asarray(traj[0, 0]), atol=1e-6)

    # The recon forward is a different compiled graph, so its eps differs by
    # ~fp32 ulp; the random tiny UNet amplifies that chaotically per step.
    # With real SD weights the drift stays negligible; here we only check the
    # property holds to within that amplification.
    recon = guidance_forward(
        pipe.params["unet"], pipe.schedule, pipe.config.unet,
        traj[-1], cond, uncond, g,
        noise_loss=noise_loss, offset_row_mask=jnp.array([1.0, 0.0]))
    np.testing.assert_allclose(np.asarray(recon[0]), np.asarray(traj[0, 0]), atol=5e-3)


@pytest.mark.parametrize("method", [
    "directinversion+p2p",
    "ddim+p2p",
    "negative-prompt-inversion+proximal-guidance",
    "ablation_directinversion_interval_2+p2p",
    "ablation_directinversion_add-target+p2p",
    "ablation_directinversion_add-source+p2p",
])
def test_editor_methods_run(pipe, image, method):
    editor = P2PEditor(pipe)
    strip = editor(
        method, image, SRC, TAR,
        guidance_scale=7.5, proximal="l0", quantile=0.75,
        use_inversion_guidance=True, recon_lr=1.0, recon_t=400,
        blend_word=(("cat",), ("cat",)),
        eq_params={"words": ("sculpture",), "values": (2.0,)},
    )
    arr = np.asarray(strip)
    size = pipe.config.vae.sample_size
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()


def test_null_text_inversion_runs(pipe, image):
    editor = P2PEditor(pipe)
    strip = editor("null-text-inversion+p2p", image, SRC, TAR, guidance_scale=7.5)
    size = pipe.config.vae.sample_size
    assert np.asarray(strip).shape == (size, 4 * size, 3)


def test_editor_deterministic(pipe, image):
    editor = P2PEditor(pipe)
    a = np.asarray(editor("directinversion+p2p", image, SRC, TAR))
    b = np.asarray(editor("directinversion+p2p", image, SRC, TAR))
    np.testing.assert_array_equal(a, b)
