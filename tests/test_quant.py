"""Opt-in weight-only int8 (w8) UNet weights (ops/quant.py).

The quantized tree must flow through the stock ``linear`` / ``conv2d``
dispatches, stay close to the float forward, and keep input gradients
flowing (null-text / pix2pix-zero / StyleDiffusion differentiate through
the UNet). Dynamic w8a8 activation quantization was measured slower end to
end on the v5e and removed — see the ops/quant.py module docstring.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.models.layers import conv2d, linear
from pnpinversion_tpu.models.unet import init_unet_params, unet_apply
from pnpinversion_tpu.ops.quant import (
    is_quantized,
    qlinear,
    quantize_conv_params,
    quantize_linear_params,
    quantize_unet_dots,
)


def test_qlinear_exact_on_grid_points():
    # w columns on the int8 grid -> weight quantization is exact
    w = (jnp.arange(8 * 6).reshape(8, 6) % 5 - 2).astype(jnp.float32)  # ints in [-2,2]
    w = w.at[0, :].set(127.0)  # pin per-column absmax so scale = 1.0
    x = jnp.linspace(-1.0, 1.0, 3 * 8).reshape(3, 8).astype(jnp.float32)
    p = {"kernel": w, "bias": jnp.ones((6,), jnp.float32)}
    qp = quantize_linear_params(p)
    np.testing.assert_allclose(qlinear(qp, x), linear(p, x), rtol=1e-6, atol=1e-6)


def test_qlinear_error_bound_random():
    k1, k2 = jax.random.split(jax.random.PRNGKey(3))
    x = jax.random.normal(k1, (4, 64, 96), jnp.float32)
    w = jax.random.normal(k2, (96, 80), jnp.float32) * 0.05
    p = {"kernel": w}
    y = linear(p, x)
    yq = qlinear(quantize_linear_params(p), x)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.01, rel  # weight-only int8 keeps <1% error


def test_conv_w8_error_bound():
    k1, k2 = jax.random.split(jax.random.PRNGKey(9))
    x = jax.random.normal(k1, (2, 8, 8, 16), jnp.float32)
    p = {"kernel": jax.random.normal(k2, (3, 3, 16, 24), jnp.float32) * 0.1,
         "bias": jnp.zeros((24,), jnp.float32)}
    qp = quantize_conv_params(p)
    assert qp["kernel_w8"].shape == (3, 3, 16, 24)
    y, yq = conv2d(p, x), conv2d(qp, x)
    rel = float(jnp.linalg.norm(yq - y) / jnp.linalg.norm(y))
    assert rel < 0.01, rel


def test_conv1x1_w8_flattens_to_matmul():
    k1, k2 = jax.random.split(jax.random.PRNGKey(2))
    x = jax.random.normal(k1, (2, 4, 4, 8), jnp.float32)
    p = {"kernel": jax.random.normal(k2, (1, 1, 8, 12), jnp.float32) * 0.2,
         "bias": jnp.ones((12,), jnp.float32)}
    qp = quantize_conv_params(p)
    assert qp["kernel_w8"].shape == (8, 12)  # linear layout
    rel = float(jnp.linalg.norm(conv2d(qp, x) - conv2d(p, x))
                / jnp.linalg.norm(conv2d(p, x)))
    assert rel < 0.005, rel


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
    assert rel < 0.02, rel


def test_quantized_tree_shape(tiny_unet):
    qparams = quantize_unet_dots(tiny_unet)
    blk = qparams["mid_block"]["attentions"][0]["blocks"][0]
    for name in ("to_q", "to_k", "to_v", "to_out"):
        q = blk["attn1"][name]
        assert "kernel_w8" in q and q["kernel_w8"].dtype == jnp.int8
        assert "kernel" not in q
    assert "bias" in blk["ff"]["geglu"]
    # 1x1 convs (pure matmuls) quantized to the flat (in,out) qlinear layout
    t2d = qparams["mid_block"]["attentions"][0]
    for name in ("proj_in", "proj_out"):
        assert "kernel_w8" in t2d[name] and t2d[name]["kernel_w8"].ndim == 2
    shortcuts = []
    jax.tree_util.tree_map_with_path(
        lambda path, _: shortcuts.append(path)
        if any(getattr(k, "key", None) == "conv_shortcut" for k in path)
        and any(getattr(k, "key", None) == "kernel_w8" for k in path) else None,
        qparams)
    assert shortcuts, "channel-changing resnets must have a quantized shortcut"
    # 3x3 convs stay float by default (w8 convs measured neutral);
    # norms / time embedding untouched
    assert "kernel" in qparams["conv_in"]
    assert "scale" in blk["norm1"]
    assert "kernel" in qparams["time_embedding"]["linear_1"]


def test_quantize_with_convs(tiny_unet):
    qparams = quantize_unet_dots(tiny_unet, convs=True)
    assert qparams["conv_in"]["kernel_w8"].ndim == 4
    x, t, ctx = _unet_inputs()
    eps, _ = unet_apply(tiny_unet, x, t, ctx, TINY.unet)
    eps_q, _ = unet_apply(qparams, x, t, ctx, TINY.unet)
    rel = float(jnp.linalg.norm(eps_q - eps) / jnp.linalg.norm(eps))
    assert rel < 0.03, rel


def test_pipeline_quantize_flag_end_to_end():
    """SDPipeline.create(quantize='w8') flows through every editor: the
    flagship fused scan and the null-text inner Adam loop (grad through the
    quantized UNet inside while_loop-in-scan) both run on the tiny config."""
    from pnpinversion_tpu.editors.p2p_editor import P2PEditor
    from pnpinversion_tpu.pipeline import SDPipeline

    pipe = SDPipeline.create(TINY, rng=jax.random.PRNGKey(7), num_ddim_steps=4,
                             quantize="w8")
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
    # grads against dequantized weights track the float grads
    cos = jnp.sum(gx * fx) / (jnp.linalg.norm(gx) * jnp.linalg.norm(fx))
    assert float(cos) > 0.99, float(cos)
