"""MasaCtrl Mask / MaskAuto variants."""
import jax
import jax.numpy as jnp
import numpy as np

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.control.base import AttnSite
from pnpinversion_tpu.control.masactrl import (
    MasaCtrlMaskAutoControl,
    MasaCtrlMaskControl,
    MasaCtrlSpec,
    _masked_fg_bg_attention,
)
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.sampling.p2p_forward import guidance_forward


def test_masked_fg_bg_attention_blend():
    H, S, D = 2, 16, 8
    rng = jax.random.PRNGKey(0)
    q, k, v = jax.random.normal(rng, (3, H, S, D))
    key_mask = jnp.zeros((S,)).at[:8].set(1.0)
    # query fully foreground -> attends only to fg keys
    fg_only = _masked_fg_bg_attention(q, k, v, 0.35, key_mask, jnp.ones((S,)))
    ref_fg = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(
        (jnp.einsum("hqd,hkd->hqk", q, k) * 0.35
         + jnp.where(key_mask == 0, jnp.finfo(jnp.float32).min, 0.0)[None, None, :]),
        -1), v)
    np.testing.assert_allclose(np.asarray(fg_only), np.asarray(ref_fg), atol=1e-5)
    # query fully background -> only bg keys
    bg_only = _masked_fg_bg_attention(q, k, v, 0.35, key_mask, jnp.zeros((S,)))
    assert not np.allclose(np.asarray(bg_only), np.asarray(fg_only))


def test_mask_control_site_gating():
    ctrl = MasaCtrlMaskControl(MasaCtrlSpec(start_step=0, start_layer=3))
    mask = jnp.ones((8, 8))
    tensors = {"mask_s": mask, "mask_t": mask}
    q = jax.random.normal(jax.random.PRNGKey(1), (4, 2, 16, 8))
    early_site = AttnSite(index=1, place="down", resolution=4, is_cross=False, heads=2)
    assert ctrl.attention_override(early_site, q, q, q, 0.3, tensors, {},
                                   jnp.int32(5)) is None
    cross = AttnSite(index=4, place="up", resolution=4, is_cross=True, heads=2)
    assert ctrl.attention_override(cross, q, q, q, 0.3, tensors, {},
                                   jnp.int32(5)) is None
    site = AttnSite(index=4, place="up", resolution=4, is_cross=False, heads=2)
    out, _ = ctrl.attention_override(site, q, q, q, 0.3, tensors, {}, jnp.int32(5))
    assert out.shape == q.shape


def test_mask_auto_sampling_runs():
    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(31), num_ddim_steps=4)
    spec = MasaCtrlSpec(start_step=1, start_layer=2)
    # tiny config: the 16x16 aggregation res doesn't exist; use the lb res
    ctrl = MasaCtrlMaskAutoControl(spec, thres=0.1, agg_res=pipe.lb_res)
    sel = jnp.zeros((77,)).at[1].set(1.0)
    tensors = {"ref_token_mask": sel, "cur_token_mask": sel}
    cond = pipe.encode_prompt(["a cat", "a dog"])
    uncond = pipe.encode_prompt(["", ""])
    x_t = jax.random.normal(jax.random.PRNGKey(2), (1, 8, 8, 4))
    out = guidance_forward(
        pipe.params["unet"], pipe.schedule, pipe.config.unet, x_t, cond, uncond,
        jnp.asarray(7.5), ctrl, tensors)
    assert np.isfinite(np.asarray(out)).all()
