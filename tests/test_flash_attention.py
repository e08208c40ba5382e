"""Flash attention kernel vs the einsum reference (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.ops.attention import apply_probs, attention_probs
from pnpinversion_tpu.ops.flash_attention import flash_attention


@pytest.mark.parametrize("shape,scale", [
    ((2, 2, 256, 40), 40**-0.5),   # SD1.4 64x64-level head dim (pad path)
    ((1, 2, 512, 64), 64**-0.5),
    ((1, 1, 256, 128), 128**-0.5),
])
def test_flash_matches_reference(shape, scale):
    b, h, s, d = shape
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    ref = apply_probs(attention_probs(q, k, scale), v)
    out = flash_attention(q, k, v, scale, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="checks Mosaic's (undocumented) zero-fill of "
                           "implicit VMEM lane padding on real hardware")
@pytest.mark.parametrize("d", [40, 80, 160])
def test_flash_padfree_matches_einsum_on_tpu(d):
    """The pad-free fast path (d % 8 == 0, no explicit lane pad) relies on
    Mosaic zero-filling implicit lane padding — verified empirically, not a
    documented guarantee. This gate catches a jaxlib/Mosaic upgrade silently
    corrupting attention outputs (advisor r2). Escape hatch:
    PNPI_FLASH_EXPLICIT_PAD=1."""
    shape = (1, 2, 256, d)
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(2), 3)
    q = jax.random.normal(kq, shape, jnp.bfloat16)
    k = jax.random.normal(kk, shape, jnp.bfloat16)
    v = jax.random.normal(kv, shape, jnp.bfloat16)
    scale = d**-0.5
    ref = apply_probs(attention_probs(q, k, scale), v)
    out = flash_attention(q, k, v, scale, block_q=128, block_k=128)
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2)


@pytest.mark.parametrize("shape,scale", [
    ((1, 2, 256, 40), 40**-0.5),   # explicit-pad path (interpret)
    ((1, 1, 256, 128), 128**-0.5),
])
def test_flash_grad_matches_reference(shape, scale):
    """Reverse-mode through the Pallas FlashAttention-2 backward kernels ==
    grad of the einsum reference (null-text / pix2pix-zero differentiate
    through the UNet's flash sites at production shape)."""
    b, h, s, d = shape
    kq, kk, kv, kw = jax.random.split(jax.random.PRNGKey(3), 4)
    q = jax.random.normal(kq, shape, jnp.float32)
    k = jax.random.normal(kk, shape, jnp.float32)
    v = jax.random.normal(kv, shape, jnp.float32)
    w = jax.random.normal(kw, shape, jnp.float32)  # nontrivial cotangent

    def loss_flash(q, k, v):
        out = flash_attention(q, k, v, scale, block_q=128, block_k=128,
                              interpret=True)
        return jnp.sum(out * w)

    def loss_ref(q, k, v):
        return jnp.sum(apply_probs(attention_probs(q, k, scale), v) * w)

    got = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, r, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-4,
                                   err_msg=f"d{name}")


def test_flash_grad_cross_seq():
    """Backward with different q/kv sequence lengths (cross-attn shape)."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(4), 3)
    q = jax.random.normal(kq, (1, 2, 256, 64))
    k = jax.random.normal(kk, (1, 2, 128, 64))
    v = jax.random.normal(kv, (1, 2, 128, 64))

    def loss(fn):
        def f(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return jax.grad(f, argnums=(0, 1, 2))(q, k, v)

    got = loss(lambda q, k, v: flash_attention(
        q, k, v, 0.125, block_q=128, block_k=128, interpret=True))
    want = loss(lambda q, k, v: apply_probs(attention_probs(q, k, 0.125), v))
    for g, r in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-4)


def test_flash_grad_under_vmap():
    """The sweep differentiates vmapped programs; the custom VJP must batch."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(5), 3)
    q = jax.random.normal(kq, (2, 1, 2, 128, 32))
    k = jax.random.normal(kk, (2, 1, 2, 128, 32))
    v = jax.random.normal(kv, (2, 1, 2, 128, 32))
    scale = 32**-0.5

    def one(q, k, v):
        out = flash_attention(q, k, v, scale, block_q=128, block_k=128,
                              interpret=True)
        return jnp.sum(out ** 2)

    got = jax.grad(lambda q, k, v: jnp.sum(jax.vmap(one)(q, k, v)),
                   argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(
        lambda q, k, v: jnp.sum(jax.vmap(lambda a, b, c: jnp.sum(
            apply_probs(attention_probs(a, b, scale), c) ** 2))(q, k, v)),
        argnums=(0, 1, 2))(q, k, v)
    for g, r in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=2e-4)


def test_flash_cross_seq():
    """Different q/kv sequence lengths."""
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(1), 3)
    q = jax.random.normal(kq, (1, 2, 256, 64))
    k = jax.random.normal(kk, (1, 2, 128, 64))
    v = jax.random.normal(kv, (1, 2, 128, 64))
    ref = apply_probs(attention_probs(q, k, 0.125), v)
    out = flash_attention(q, k, v, 0.125, block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_default_block_table():
    """Per-shape tuned defaults (scripts/tune_flash.py --rows 12 on v5e):
    full-K inner tile at seq 4096, full-seq tiles at 1024, and everything
    clipped to the actual sequence lengths; bwd caps at (512, 1024)."""
    from pnpinversion_tpu.ops.flash_attention import _default_blocks

    assert _default_blocks(4096, 4096) == (512, 4096)
    assert _default_blocks(1024, 1024) == (1024, 1024)
    assert _default_blocks(1024, 77) == (1024, 77)    # cross-attn kv
    assert _default_blocks(256, 256) == (256, 256)    # tiny/CPU shapes
    assert _default_blocks(8192, 8192) == (512, 4096)  # larger stays capped
