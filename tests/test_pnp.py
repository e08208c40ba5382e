"""PnP injection semantics + editor smoke on the tiny config."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import SD14_UNET, TINY
from pnpinversion_tpu.control.base import AttnSite
from pnpinversion_tpu.control.pnp import make_pnp_control, pnp_injection_sites
from pnpinversion_tpu.editors.pnp_editor import PnPEditor
from pnpinversion_tpu.pipeline import SDPipeline


def test_injection_sites_sd14():
    """Decoder blocks 4-11: up1[1,2], up2[0,1,2], up3[0,1,2]
    (run_editing_pnp.py:231-235) == transformer blocks 8..15."""
    assert pnp_injection_sites(SD14_UNET) == (8, 9, 10, 11, 12, 13, 14, 15)


def test_qk_injection_window():
    ctrl = make_pnp_control(SD14_UNET, num_steps=50)  # qk_t=25, conv_t=40
    assert ctrl.spec.qk_t == 25 and ctrl.spec.conv_t == 40
    site = AttnSite(index=10, place="up", resolution=4, is_cross=False, heads=2)
    rng = jax.random.PRNGKey(0)
    q, k, v = jax.random.normal(rng, (3, 3, 2, 8, 4))
    q2, k2, v2 = ctrl.qkv_hook(site, q, k, v, {}, {}, jnp.int32(10))
    # rows 1,2 get row 0's q/k; v untouched
    np.testing.assert_allclose(np.asarray(q2[1]), np.asarray(q[0]))
    np.testing.assert_allclose(np.asarray(k2[2]), np.asarray(k[0]))
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v))
    # outside window
    q3, k3, _ = ctrl.qkv_hook(site, q, k, v, {}, {}, jnp.int32(30))
    np.testing.assert_array_equal(np.asarray(q3), np.asarray(q))
    # cross-attn / non-injected sites untouched
    cross = AttnSite(index=10, place="up", resolution=4, is_cross=True, heads=2)
    q4, _, _ = ctrl.qkv_hook(cross, q, k, v, {}, {}, jnp.int32(10))
    np.testing.assert_array_equal(np.asarray(q4), np.asarray(q))


def test_conv_injection():
    ctrl = make_pnp_control(SD14_UNET, num_steps=50)
    h = jax.random.normal(jax.random.PRNGKey(1), (3, 4, 4, 8))
    out = ctrl.resnet_hook("up_1_resnet_1", h, {}, {}, jnp.int32(5))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(h[0]))
    out2 = ctrl.resnet_hook("up_1_resnet_0", h, {}, {}, jnp.int32(5))
    np.testing.assert_array_equal(np.asarray(out2), np.asarray(h))
    out3 = ctrl.resnet_hook("up_1_resnet_1", h, {}, {}, jnp.int32(45))
    np.testing.assert_array_equal(np.asarray(out3), np.asarray(h))


@pytest.mark.parametrize("method", ["ddim+pnp", "directinversion+pnp"])
def test_pnp_editor_runs(method):
    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(9), num_ddim_steps=6)
    editor = PnPEditor(pipe)
    assert int(editor.schedule.timesteps[-1]) == 1  # steps_offset=1
    rng = np.random.RandomState(2)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    strip = editor(method, img, "a cat", "a dog", guidance_scale=7.5)
    arr = np.asarray(strip)
    assert arr.shape == (size, 4 * size, 3)
    assert np.isfinite(arr).all()
