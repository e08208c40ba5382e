"""SD2.1-style per-level head dims (heads = channels // head_dim)."""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pnpinversion_tpu.configs import SD21_UNET, UNetConfig
from pnpinversion_tpu.models.unet import enumerate_sites, init_unet_params, unet_apply


def test_sd21_heads_per_level():
    sites = enumerate_sites(SD21_UNET)
    heads = [s[0].heads for s in sites]
    # levels 64/32/16 down, 8 mid, 16/32/64 up with channels/64 heads
    assert heads == [5, 5, 10, 10, 20, 20, 20, 20, 20, 20, 10, 10, 10, 5, 5, 5]


def test_head_dim_forward():
    cfg = UNetConfig(sample_size=8, block_out_channels=(32, 64),
                     layers_per_block=1, cross_attention=(True, True),
                     head_dim=16, context_dim=32, norm_groups=8)
    sites = enumerate_sites(cfg)
    assert [s[0].heads for s in sites] == [2, 4, 4, 4, 4, 2, 2]
    params = init_unet_params(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
    eps, _ = unet_apply(params, x, jnp.int32(500), ctx, cfg)
    assert eps.shape == x.shape
    assert np.isfinite(np.asarray(eps)).all()
