"""Shared functional NN layers (NHWC, param-dict based).

Models are pure functions over nested param dicts whose key names mirror the
HF diffusers/transformers state-dict layout, so the torch->jax converter in
``pnpinversion_tpu/convert`` is a mechanical rename. NHWC + HWIO layouts are
used throughout (TPU-native; the reference's NCHW is a CUDA convention).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# initializers (tests / weightless runs; real runs load converted checkpoints)
# ---------------------------------------------------------------------------

def _fan_in(shape: Tuple[int, ...]) -> int:
    if len(shape) == 2:  # (in, out) linear
        return shape[0]
    if len(shape) == 4:  # (kh, kw, in, out) conv
        return shape[0] * shape[1] * shape[2]
    return shape[0]


def init_linear(key, in_dim: int, out_dim: int, use_bias: bool = True) -> Params:
    k1, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(in_dim)
    p = {"kernel": jax.random.uniform(k1, (in_dim, out_dim), jnp.float32, -scale, scale)}
    if use_bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def init_conv(key, in_ch: int, out_ch: int, kernel: int = 3, use_bias: bool = True) -> Params:
    k1, _ = jax.random.split(key)
    shape = (kernel, kernel, in_ch, out_ch)
    scale = 1.0 / math.sqrt(_fan_in(shape))
    p = {"kernel": jax.random.uniform(k1, shape, jnp.float32, -scale, scale)}
    if use_bias:
        p["bias"] = jnp.zeros((out_ch,), jnp.float32)
    return p


def init_norm(ch: int) -> Params:
    return {"scale": jnp.ones((ch,), jnp.float32), "bias": jnp.zeros((ch,), jnp.float32)}


# ---------------------------------------------------------------------------
# functional layers
# ---------------------------------------------------------------------------

def linear(p: Params, x: Array) -> Array:
    if "kernel_w8" in p:  # opt-in weight-only int8 layout (ops/quant.py)
        from pnpinversion_tpu.ops.quant import qlinear

        return qlinear(p, x)
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv2d(p: Params, x: Array, stride: int = 1, padding="SAME") -> Array:
    if "kernel_w8" in p:  # opt-in weight-only int8 layouts (ops/quant.py)
        if p["kernel_w8"].ndim == 2:
            # 1x1 stride-1 convs are flattened to per-pixel matmuls
            assert stride == 1
            from pnpinversion_tpu.ops.quant import qlinear

            return qlinear(p, x)
        # kxk: dequantize into the conv's weight-operand read; the
        # per-output-channel scale folds into the bias epilogue
        y = jax.lax.conv_general_dilated(
            x,
            p["kernel_w8"].astype(x.dtype),
            window_strides=(stride, stride),
            padding=padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = y * p["kernel_scale"].astype(x.dtype)
        if "bias" in p:
            y = y + p["bias"].astype(x.dtype)
        return y
    y = jax.lax.conv_general_dilated(
        x,
        p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def group_norm(p: Params, x: Array, groups: int, eps: float = 1e-5) -> Array:
    """GroupNorm over NHWC (stats in fp32 for stability).

    The per-group reductions go through a one-hot (C, G) membership matmul
    instead of a reshape to (..., groups, C/groups): SD's 10-channel groups
    land mid-lane on TPU, so the reshape forces a physical relayout of every
    activation, while the matmul contracts over the native lane dimension on
    the MXU (measured ~2x faster GN at SD shapes).

    Moments come from one pass (E[x^2] - E[x]^2, both reductions over the
    same read of x) and the normalization is folded to a single per-channel
    affine y = x*a + b, so the whole apply is one elementwise fusion over x
    with no f32 intermediate materialized to HBM. The f32 sumsq accumulation
    loses ~2^-24*(1+(mean/std)^2) relative variance accuracy — orders of
    magnitude below the bf16 activation noise floor for any realistic
    mean/std ratio.
    """
    orig_dtype = x.dtype
    b, h, w, c = x.shape
    cg = c // groups
    member = (jnp.arange(c, dtype=jnp.int32)[:, None] // cg
              == jnp.arange(groups, dtype=jnp.int32)[None, :]).astype(jnp.float32)
    n = h * w * cg
    xf = x.astype(jnp.float32).reshape(b, h * w, c)
    sum_g = jnp.einsum("bsc,cg->bg", xf, member,
                       preferred_element_type=jnp.float32)
    sumsq_g = jnp.einsum("bsc,cg->bg", xf * xf, member,
                         preferred_element_type=jnp.float32)
    mean_g = sum_g / n
    var_g = jnp.maximum(sumsq_g / n - mean_g * mean_g, 0.0)
    inv_g = jax.lax.rsqrt(var_g + eps)
    a_c = (inv_g @ member.T) * p["scale"].astype(jnp.float32)[None]
    b_c = (p["bias"].astype(jnp.float32)[None]
           - (mean_g * inv_g) @ member.T * p["scale"].astype(jnp.float32)[None])
    y = xf * a_c[:, None, :] + b_c[:, None, :]
    return y.reshape(b, h, w, c).astype(orig_dtype)


def layer_norm(p: Params, x: Array, eps: float = 1e-5) -> Array:
    """LayerNorm in f32 with the normalization folded to a single fused
    elementwise pass.

    Moments: one-pass (E[x^2] - E[x]^2) only for bf16 inputs, where the
    ~2^-24*(1+(mean/std)^2) cancellation error sits far below the activation
    noise floor. For f32 inputs — the CLIP/DINO/LPIPS metric towers, whose
    ViT activations have extreme outlier channels that inflate mean^2/var —
    use the two-pass subtract-mean variance (no cancellation)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    if orig_dtype == jnp.bfloat16:
        meansq = (xf * xf).mean(axis=-1, keepdims=True)
        var = jnp.maximum(meansq - mean * mean, 0.0)
    else:
        d = xf - mean
        var = (d * d).mean(axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * inv
    y = y * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    return y.astype(orig_dtype)


def silu(x: Array) -> Array:
    return x * jax.nn.sigmoid(x)


def quick_gelu(x: Array) -> Array:
    return x * jax.nn.sigmoid(1.702 * x)


def timestep_embedding(
    t: Array,
    dim: int,
    max_period: float = 10000.0,
    flip_sin_to_cos: bool = True,
    downscale_freq_shift: float = 0.0,
    dtype=jnp.float32,
) -> Array:
    """Sinusoidal timestep embedding (diffusers ``Timesteps`` semantics)."""
    t = jnp.atleast_1d(t).astype(jnp.float32)
    half = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half, dtype=jnp.float32)
    exponent = exponent / (half - downscale_freq_shift)
    emb = t[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half:], emb[:, :half]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb.astype(dtype)


def nearest_upsample_2x(x: Array) -> Array:
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, h * 2, w * 2, c)
