"""Opt-in int8 (w8a8) transformer-matmul path (ops/quant.py).

The quantized tree must flow through the stock ``linear`` dispatch, stay
close to the float forward, and keep input gradients flowing (null-text /
pix2pix-zero / StyleDiffusion differentiate through the UNet)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.models.layers import linear
from pnpinversion_tpu.models.unet import init_unet_params, unet_apply
from pnpinversion_tpu.ops.quant import (
    is_quantized,
    qlinear,
    quantize_linear_params,
    quantize_unet_dots,
)


def test_qlinear_exact_on_grid_points():
    # x rows and w columns already on the int8 grid -> quantization is exact
    w = (jnp.arange(8 * 6).reshape(8, 6) % 5 - 2).astype(jnp.float32)  # ints in [-2,2]
    w = w.at[0, :].set(127.0)  # pin per-column absmax so scale = 1.0
    x = (jnp.arange(3 * 8).reshape(3, 8) % 7 - 3).astype(jnp.float32)
    x = x.at[:, 0].set(127.0)
    p = {"kernel": w, "bias": jnp.ones((6,), jnp.float32)}
    qp = quantize_linear_params(p)
    np.testing.assert_allclose(qlinear(qp, x), linear(p, x), rtol=1e-6)


def test_qlinear_error_bound_random():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (4, 64, 96), jnp.float32)
    w = jax.random.normal(k2, (96, 80), jnp.float32) * 0.05
    p = {"kernel": w}
    y = linear(p, x)
    yq = qlinear(quantize_linear_params(p), x)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.02, rel  # w8a8 per-token/per-channel keeps ~1% error


def test_linear_dispatches_on_quantized_layout():
    p = {"kernel": jnp.eye(4, dtype=jnp.float32) * 0.5}
    qp = quantize_linear_params(p)
    x = jnp.ones((2, 4), jnp.bfloat16)
    out = linear(qp, x)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(linear(p, x), np.float32), rtol=1e-2)


@pytest.fixture(scope="module")
def tiny_unet():
    return init_unet_params(jax.random.PRNGKey(0), TINY.unet)


def _unet_inputs(dtype=jnp.float32):
    cfg = TINY.unet
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    x = jax.random.normal(k1, (2, cfg.sample_size, cfg.sample_size, cfg.in_channels), dtype)
    ctx = jax.random.normal(k2, (2, 77, cfg.context_dim), dtype)
    t = jnp.asarray([11], jnp.int32)
    return x, t, ctx


def test_quantized_unet_close_to_float(tiny_unet):
    qparams = quantize_unet_dots(tiny_unet)
    assert is_quantized(qparams) and not is_quantized(tiny_unet)
    x, t, ctx = _unet_inputs()
    eps, _ = unet_apply(tiny_unet, x, t, ctx, TINY.unet)
    eps_q, _ = unet_apply(qparams, x, t, ctx, TINY.unet)
    rel = float(jnp.linalg.norm(eps_q - eps) / jnp.linalg.norm(eps))
    assert rel < 0.05, rel


def test_quantized_tree_shape(tiny_unet):
    qparams = quantize_unet_dots(tiny_unet)
    blk = qparams["mid_block"]["attentions"][0]["blocks"][0]
    for name in ("to_q", "to_k", "to_v", "to_out"):
        q = blk["attn1"][name]
        assert "kernel_q8" in q and q["kernel_q8"].dtype == jnp.int8
        assert "kernel" not in q
    assert "bias" in blk["ff"]["geglu"]
    # convs / norms untouched
    assert "kernel" in qparams["conv_in"]
    assert "scale" in blk["norm1"]


def test_pipeline_quantize_flag_end_to_end():
    """SDPipeline.create(quantize='int8') flows through every editor: the
    flagship fused scan and the null-text inner Adam loop (grad through the
    quantized UNet inside while_loop-in-scan) both run on the tiny config."""
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.pipeline import SDPipeline

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(7), num_ddim_steps=4,
                             quantize="int8")
    assert is_quantized(pipe.params["unet"])
    editor = P2PEditor(pipe)
    rng = np.random.RandomState(3)
    size = pipe.config.vae.sample_size
    img = (rng.rand(size, size, 3) * 255).astype(np.uint8)
    for method in ("directinversion+p2p", "null-text-inversion+p2p"):
        out = editor(method, img, "a cat on a mat", "a dog on a mat",
                     guidance_scale=7.5)
        assert np.asarray(out).shape[-1] == 3


def test_input_gradients_flow_through_quantized_unet(tiny_unet):
    qparams = quantize_unet_dots(tiny_unet)
    x, t, ctx = _unet_inputs()

    def loss(params, x, ctx):
        eps, _ = unet_apply(params, x, t, ctx, TINY.unet)
        return jnp.sum(eps ** 2)

    gx, gctx = jax.grad(loss, argnums=(1, 2))(qparams, x, ctx)
    fx, fctx = jax.grad(loss, argnums=(1, 2))(tiny_unet, x, ctx)
    assert bool(jnp.all(jnp.isfinite(gx))) and bool(jnp.all(jnp.isfinite(gctx)))
    # straight-through grads track the float grads directionally
    cos = jnp.sum(gx * fx) / (jnp.linalg.norm(gx) * jnp.linalg.norm(fx))
    assert float(cos) > 0.98, float(cos)
