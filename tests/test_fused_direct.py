"""Fused offsets+edit scan vs the two-phase path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.control.p2p import P2PControl, make_p2p_control
from pnpinversion_tpu.editors.p2p_editor import P2PEditor
from pnpinversion_tpu.inversion.ddim_inversion import (
    ddim_invert_loop,
    direct_inversion_offsets,
)
from pnpinversion_tpu.models.vae import image_to_latent
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.sampling.p2p_forward import (
    fused_direct_inversion_edit,
    guidance_forward,
)

SRC = "a cat on a mat"
TAR = "a silver cat sculpture on a mat"


@pytest.fixture(scope="module")
def pipe():
    return SDPipeline.create(TINY, rng=jax.random.PRNGKey(7), num_ddim_steps=6)


def test_fused_matches_two_phase(pipe):
    rng = np.random.RandomState(3)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    latent = image_to_latent(pipe.params["vae"], jnp.asarray(img), pipe.config.vae)
    cond = pipe.encode_prompt([SRC, TAR])
    uncond = pipe.encode_prompt(["", ""])
    g = jnp.asarray(7.5)
    T = pipe.schedule.num_steps

    traj = ddim_invert_loop(pipe.params["unet"], pipe.schedule, latent, cond[:1],
                            pipe.config.unet)
    ctrl, tensors = make_p2p_control(
        [SRC, TAR], pipe.tokenizer, num_steps=T,
        blend_words=(("cat",), ("cat",)),
        eq_params={"words": ("sculpture",), "values": (2.0,)},
        num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
        latent_size=pipe.latent_size)

    # two-phase
    context = jnp.concatenate([uncond, cond], axis=0)
    noise_loss, _ = direct_inversion_offsets(
        pipe.params["unet"], pipe.schedule, traj, context, g, pipe.config.unet)
    row_mask = jnp.array([1.0, 0.0])
    two_phase = guidance_forward(
        pipe.params["unet"], pipe.schedule, pipe.config.unet, traj[-1],
        cond, uncond, g, ctrl, tensors, noise_loss, row_mask)

    # fused (2B-row scan: the edit pass's source row doubles as the offset
    # replay, so the controller uses the plain spec)
    fused = fused_direct_inversion_edit(
        pipe.params["unet"], pipe.schedule, pipe.config.unet, traj, cond, uncond,
        g, P2PControl(ctrl.spec), tensors, row_mask, jnp.ones((T,)))

    # different compiled graphs -> fp noise amplified by the tiny random UNet;
    # the math is identical
    np.testing.assert_allclose(np.asarray(fused), np.asarray(two_phase), atol=0.05)
    # the source row still lands on the inversion trajectory exactly
    np.testing.assert_allclose(np.asarray(fused[0]), np.asarray(traj[0, 0]), atol=0.05)


def test_srcfree_matches_fused(pipe):
    """The (2B-1)-row source-free scan == the 2B-row fused scan with full
    offsets: the dropped uncond-source row's eps only fed the source row's
    CFG step, which the offset add cancels."""
    import dataclasses

    from pnpinversion_tpu.sampling.p2p_forward import (
        fused_direct_inversion_edit_srcfree,
    )

    rng = np.random.RandomState(11)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    latent = image_to_latent(pipe.params["vae"], jnp.asarray(img), pipe.config.vae)
    cond = pipe.encode_prompt([SRC, TAR])
    uncond = pipe.encode_prompt(["", ""])
    g = jnp.asarray(7.5)
    T = pipe.schedule.num_steps

    traj = ddim_invert_loop(pipe.params["unet"], pipe.schedule, latent, cond[:1],
                            pipe.config.unet)
    ctrl, tensors = make_p2p_control(
        [SRC, TAR], pipe.tokenizer, num_steps=T,
        blend_words=(("cat",), ("cat",)),
        num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
        latent_size=pipe.latent_size)

    row_mask = jnp.array([1.0, 0.0])
    fused = fused_direct_inversion_edit(
        pipe.params["unet"], pipe.schedule, pipe.config.unet, traj, cond, uncond,
        g, P2PControl(ctrl.spec), tensors, row_mask, jnp.ones((T,)))

    spec3 = dataclasses.replace(ctrl.spec, uncond_rows=ctrl.spec.batch_size - 1)
    srcfree = fused_direct_inversion_edit_srcfree(
        pipe.params["unet"], pipe.schedule, pipe.config.unet, traj, cond, uncond,
        g, P2PControl(spec3), tensors)

    # source row is the exact trajectory in both
    np.testing.assert_allclose(np.asarray(srcfree[0]), np.asarray(traj[0, 0]),
                               atol=1e-5)
    # target rows: identical math, different compiled graphs (batch 3 vs 4)
    np.testing.assert_allclose(np.asarray(srcfree), np.asarray(fused), atol=0.05)


def test_editor_fused_vs_classic_strip(pipe):
    rng = np.random.RandomState(5)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    editor = P2PEditor(pipe)
    a = np.asarray(editor.edit_direct_inversion(img, SRC, TAR, fused=True))
    b = np.asarray(editor.edit_direct_inversion(img, SRC, TAR, fused=False,
                                                fast_recon=False))
    assert a.shape == b.shape
    # strips agree up to fp-noise-amplified pixel differences
    assert np.mean(np.abs(a.astype(np.int32) - b.astype(np.int32))) < 20
