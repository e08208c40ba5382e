"""Model forward sanity on the tiny config: shapes, determinism, site map."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import SD14_UNET, TINY
from pnpinversion_tpu.models.clip_text import clip_text_apply, init_clip_text_params
from pnpinversion_tpu.models.unet import (
    enumerate_sites,
    init_unet_params,
    lb_resolution,
    num_lb_slots,
    unet_apply,
)
from pnpinversion_tpu.models.vae import (
    image_to_latent,
    init_vae_params,
    latent_to_image,
    vae_decode,
    vae_encode,
)


@pytest.fixture(scope="module")
def tiny_unet_params():
    return init_unet_params(jax.random.PRNGKey(0), TINY.unet)


def test_site_enumeration_sd14():
    sites = enumerate_sites(SD14_UNET)
    assert len(sites) == 16  # 6 down + 1 mid + 9 up transformer blocks
    assert SD14_UNET.num_transformer_blocks() == 16
    res = [s[0].resolution for s in sites]
    assert res == [64, 64, 32, 32, 16, 16, 8, 16, 16, 16, 32, 32, 32, 64, 64, 64]
    # LocalBlend slots: 2 down@16 cross + 3 up@16 cross (reference
    # attention_control.py:112 uses down_cross[2:4] + up_cross[:3])
    assert num_lb_slots(SD14_UNET) == 5
    assert lb_resolution(SD14_UNET) == 16
    lb_sites = [s[1] for s in sites if s[1].lb_slot >= 0]
    assert [s.place for s in lb_sites] == ["down", "down", "up", "up", "up"]
    assert [s.lb_slot for s in lb_sites] == [0, 1, 2, 3, 4]
    # store ordering mirrors the reference's ≤32² lists
    down_cross = [s[1] for s in sites if s[1].place == "down" and s[1].place_index >= 0]
    assert [s.resolution for s in down_cross] == [32, 32, 16, 16]


def test_unet_forward_tiny(tiny_unet_params):
    cfg = TINY.unet
    x = jax.random.normal(jax.random.PRNGKey(1), (2, cfg.sample_size, cfg.sample_size, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (2, 77, cfg.context_dim))
    t = jnp.int32(500)
    eps, state = unet_apply(tiny_unet_params, x, t, ctx, cfg)
    assert eps.shape == x.shape
    assert state == {}
    eps2, _ = unet_apply(tiny_unet_params, x, t, ctx, cfg)
    np.testing.assert_array_equal(np.asarray(eps), np.asarray(eps2))
    # context sensitivity
    eps3, _ = unet_apply(tiny_unet_params, x, t, ctx * 2, cfg)
    assert not np.allclose(np.asarray(eps), np.asarray(eps3))


def test_unet_jit_and_timestep_sensitivity(tiny_unet_params):
    cfg = TINY.unet
    x = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.sample_size, cfg.sample_size, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, cfg.context_dim))
    f = jax.jit(lambda p, x, t, c: unet_apply(p, x, t, c, cfg)[0])
    a = f(tiny_unet_params, x, jnp.int32(10), ctx)
    b = f(tiny_unet_params, x, jnp.int32(900), ctx)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_vae_roundtrip_shapes():
    cfg = TINY.vae
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.uniform(jax.random.PRNGKey(1), (1, cfg.sample_size, cfg.sample_size, 3)) * 2 - 1
    z = vae_encode(params, img, cfg)
    assert z.shape == (1, cfg.sample_size // 2, cfg.sample_size // 2, cfg.latent_channels)
    rec = vae_decode(params, z, cfg)
    assert rec.shape == img.shape


def test_vae_uint8_pipeline():
    cfg = TINY.vae
    params = init_vae_params(jax.random.PRNGKey(0), cfg)
    img = (np.random.rand(cfg.sample_size, cfg.sample_size, 3) * 255).astype(np.uint8)
    z = image_to_latent(params, jnp.asarray(img), cfg)
    out = latent_to_image(params, z, cfg)
    assert out.dtype == jnp.uint8
    assert out.shape == (1, cfg.sample_size, cfg.sample_size, 3)


def test_clip_text():
    cfg = TINY.text
    params = init_clip_text_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.array([[0, 5, 6, 7, 1] + [1] * 72], dtype=jnp.int32)
    h = clip_text_apply(params, ids, cfg)
    assert h.shape == (1, 77, cfg.width)
    # causality: changing a late token must not affect earlier positions
    ids2 = ids.at[0, 3].set(9)
    h2 = clip_text_apply(params, ids2, cfg)
    np.testing.assert_allclose(np.asarray(h[0, :3]), np.asarray(h2[0, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(h[0, 3:5]), np.asarray(h2[0, 3:5]))


def test_fast_random_like_matches_init_structure():
    """TPU-path fast init: same tree/shapes/dtypes as the per-leaf init,
    ones/zeros for norm scale/bias, finite fan-in-scaled kernels."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pnpinversion_tpu.configs import TINY
    from pnpinversion_tpu.models.clip_text import init_clip_text_params
    from pnpinversion_tpu.models.unet import init_unet_params
    from pnpinversion_tpu.models.vae import init_vae_params
    from pnpinversion_tpu.pipeline import fast_random_like

    def init(key):
        k1, k2, k3 = jax.random.split(key, 3)
        return {"unet": init_unet_params(k1, TINY.unet),
                "vae": init_vae_params(k2, TINY.vae),
                "text": init_clip_text_params(k3, TINY.text)}

    key = jax.random.PRNGKey(5)
    slow = init(key)
    fast = jax.jit(lambda k: fast_random_like(k, init))(key)
    assert jax.tree_util.tree_structure(slow) == jax.tree_util.tree_structure(fast)
    for (pa, a), (pb, b) in zip(jax.tree_util.tree_flatten_with_path(slow)[0],
                                jax.tree_util.tree_flatten_with_path(fast)[0]):
        assert pa == pb and a.shape == b.shape and a.dtype == b.dtype
        assert np.isfinite(np.asarray(b)).all()
        name = str(getattr(pa[-1], "key", pa[-1]))
        if name == "scale":
            assert np.all(np.asarray(b) == 1.0)
        elif name == "bias":
            assert np.all(np.asarray(b) == 0.0)
        elif b.ndim >= 2:
            # same fan-in-scaled uniform family as the per-leaf init
            assert float(np.abs(np.asarray(b)).max()) <= float(
                np.abs(np.asarray(a)).max()) * 3 + 1e-6
