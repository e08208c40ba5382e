"""Checkpoint cache: orbax save/load round-trip of a param tree."""
import jax
import jax.numpy as jnp
import numpy as np

from pnpinversion_tpu.configs import TINY_UNET
from pnpinversion_tpu.convert.checkpoint import _orbax_load, _orbax_save
from pnpinversion_tpu.models.unet import init_unet_params


def test_orbax_roundtrip(tmp_path):
    params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    path = tmp_path / "ckpt"
    _orbax_save(str(path), params)
    restored = _orbax_load(str(path))
    flat_a = jax.tree.leaves(params)
    flat_b = jax.tree.leaves(restored)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jax.tree.structure(params) == jax.tree.structure(restored)
