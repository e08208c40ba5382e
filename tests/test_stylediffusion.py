"""StyleDiffusion: mapper math, V-context control semantics, editor smoke."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.control.base import AttnSite
from pnpinversion_tpu.control.stylediffusion import (
    StyleDiffusionControl,
    StyleDiffusionSpec,
    StyleTrainControl,
)
from pnpinversion_tpu.models import vit
from pnpinversion_tpu.models.stylediffusion import (
    forward_embed,
    init_mapper_params,
    mapper_apply,
    mapper_at_step,
)
from pnpinversion_tpu.pipeline import SDPipeline

TINY_CLIP = vit.ViTConfig(image_size=16, patch_size=8, width=32, layers=2,
                          heads=2, projection_dim=16)


def test_mapper_shapes():
    T, tokens_in, width = 4, 5, 32
    p = init_mapper_params(jax.random.PRNGKey(0), T, tokens_in=tokens_in,
                           width=width)
    p0 = mapper_at_step(p, jnp.int32(2))
    img = jax.random.normal(jax.random.PRNGKey(1), (1, tokens_in, width))
    out = mapper_apply(p0, img)
    assert out.shape == (1, 154, width)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, width))
    mapped = forward_embed(p0, ctx, img)
    assert mapped.shape == (1, 77, width)
    # scale/shift structure: emb[:77]*ctx + emb[77:]
    np.testing.assert_allclose(
        np.asarray(mapped),
        np.asarray(ctx * out[:, :77] + out[:, 77:]), atol=1e-6)


def test_v_context_gating():
    """Source cond row always mapped; target rows gated by tau_v window;
    uncond rows never mapped."""
    spec = StyleDiffusionSpec(batch_size=2, num_steps=10, v_replace_end=5)
    ctrl = StyleDiffusionControl(spec)
    p = init_mapper_params(jax.random.PRNGKey(0), 10, tokens_in=5, width=32)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (4, 77, 32))
    tensors = {"img_tokens": img, "sd_mapper": p}
    site = AttnSite(index=0, place="down", resolution=4, is_cross=True, heads=2)

    early = ctrl.value_context_hook(site, ctx, tensors, {}, jnp.int32(1))
    late = ctrl.value_context_hook(site, ctx, tensors, {}, jnp.int32(8))
    # uncond rows untouched
    np.testing.assert_array_equal(np.asarray(early[:2]), np.asarray(ctx[:2]))
    # source cond row mapped in both windows
    assert not np.allclose(np.asarray(early[2]), np.asarray(ctx[2]))
    assert not np.allclose(np.asarray(late[2]), np.asarray(ctx[2]))
    # target cond row mapped only early
    assert not np.allclose(np.asarray(early[3]), np.asarray(ctx[3]))
    np.testing.assert_array_equal(np.asarray(late[3]), np.asarray(ctx[3]))

    # self-attn sites untouched
    self_site = dataclasses.replace(site, is_cross=False)
    out = ctrl.value_context_hook(self_site, ctx, tensors, {}, jnp.int32(1))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ctx))


def test_train_control_rows():
    ctrl = StyleTrainControl("cond_half")
    p = mapper_at_step(init_mapper_params(jax.random.PRNGKey(0), 1, 5, width=32), 0)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 5, 32))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, 32))
    site = AttnSite(index=0, place="down", resolution=4, is_cross=True, heads=2)
    out = ctrl.value_context_hook(site, ctx, {"sd_mapper_i": p, "img_tokens": img},
                                  {}, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(out[0]), np.asarray(ctx[0]))
    assert not np.allclose(np.asarray(out[1]), np.asarray(ctx[1]))


def test_stylediffusion_editor_runs():
    from pnpinversion_tpu.editors.stylediffusion_editor import StyleDiffusionEditor

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(30), num_ddim_steps=4)
    editor = StyleDiffusionEditor(pipe, clip_vision_cfg=TINY_CLIP)
    rng = np.random.RandomState(9)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    strip = editor("stylediffusion+p2p", img, "a cat on a mat", "a dog on a mat",
                   num_inner_steps=2)
    arr = np.asarray(strip)
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()


def test_stylediffusion_replace_rule():
    """Reference run_editing_stylediffusion.py:181 ignores the runner's
    is_replace_controller=False (:253) and selects AttentionReplace by
    CHARACTER-length equality of the space-stripped prompts. Where that rule
    fires but word counts differ, the reference's get_replacement_mapper_
    raises and its sweep dies; we degrade to Refine there."""
    from pnpinversion_tpu.editors.stylediffusion_editor import (
        stylediffusion_is_replace,
    )

    # char lengths equal, word counts equal -> Replace (reference behavior)
    assert stylediffusion_is_replace("a cat on a mat", "a dog on a mat")
    # char lengths differ -> Refine even though word counts match
    assert not stylediffusion_is_replace("a cat on a mat", "a tiger on a mat")
    # char lengths equal but word counts differ -> reference crashes;
    # we fall back to Refine
    src, tar = "a cat sat", "bigredcat"  # 9 chars each; 3 words vs 1 word
    assert len(src) == len(tar) and len(src.split()) != len(tar.split())
    assert not stylediffusion_is_replace(src, tar)


def test_stylediffusion_char_equal_prompts_run():
    """End-to-end: char-equal word-unequal prompts (the reference's crash
    case) must still produce a strip via the Refine fallback."""
    from pnpinversion_tpu.editors.stylediffusion_editor import StyleDiffusionEditor

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(31), num_ddim_steps=4)
    editor = StyleDiffusionEditor(pipe, clip_vision_cfg=TINY_CLIP)
    rng = np.random.RandomState(10)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    strip = editor("stylediffusion+p2p", img, "a cat sat", "bigredcat",
                   num_inner_steps=1)
    arr = np.asarray(strip)
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()
