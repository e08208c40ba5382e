"""LPIPS with a SqueezeNet-1.1 backbone, functional jnp.

Parity: torchmetrics LearnedPerceptualImagePatchSimilarity(net_type='squeeze')
as configured by the reference (matrics_calculator.py:276), i.e. the lpips
package's squeeze variant: 7 ReLU tap points, per-channel unit-normalized
feature differences, learned 1x1 linear heads, spatial mean, sum over taps.
Inputs in [-1, 1] (the reference passes img*2-1, :340).
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]

# SqueezeNet-1.1 fire configs: (in, squeeze, expand1x1, expand3x3)
_FIRE = [
    (64, 16, 64, 64),
    (128, 16, 64, 64),
    (128, 32, 128, 128),
    (256, 32, 128, 128),
    (256, 48, 192, 192),
    (384, 48, 192, 192),
    (384, 64, 256, 256),
    (512, 64, 256, 256),
]
# channels at the 7 LPIPS tap points
LPIPS_CHANNELS = [64, 128, 256, 384, 384, 512, 512]

SHIFT = jnp.array([-0.030, -0.088, -0.188])
SCALE = jnp.array([0.458, 0.448, 0.450])


def _conv_init(key, kh, kw, cin, cout):
    scale = (1.0 / (kh * kw * cin)) ** 0.5
    return {
        "kernel": jax.random.uniform(key, (kh, kw, cin, cout), jnp.float32, -scale, scale),
        "bias": jnp.zeros((cout,)),
    }


def init_lpips_params(key) -> Params:
    keys = iter(jax.random.split(key, 64))
    p: Params = {"conv0": _conv_init(next(keys), 3, 3, 3, 64), "fires": [], "lins": []}
    for cin, sq, e1, e3 in _FIRE:
        p["fires"].append({
            "squeeze": _conv_init(next(keys), 1, 1, cin, sq),
            "expand1": _conv_init(next(keys), 1, 1, sq, e1),
            "expand3": _conv_init(next(keys), 3, 3, sq, e3),
        })
    for c in LPIPS_CHANNELS:
        p["lins"].append({"kernel": jnp.abs(jax.random.normal(next(keys), (1, 1, c, 1))) * 0.1})
    return p


def _conv(p, x, stride=1, padding="SAME"):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (stride, stride), padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + p["bias"].astype(x.dtype) if "bias" in p else y


def _maxpool_ceil(x, window=3, stride=2):
    """MaxPool2d(3, 2, ceil_mode=True): pad right/bottom so the last window fits."""
    h, w = x.shape[1], x.shape[2]
    def pad_amount(size):
        import math
        out = math.ceil((size - window) / stride) + 1
        return max(0, (out - 1) * stride + window - size)
    ph, pw = pad_amount(h), pad_amount(w)
    x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), constant_values=-jnp.inf)
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1), "VALID")


def _fire(p, x):
    s = jax.nn.relu(_conv(p["squeeze"], x))
    e1 = jax.nn.relu(_conv(p["expand1"], s))
    e3 = jax.nn.relu(_conv(p["expand3"], s))
    return jnp.concatenate([e1, e3], axis=-1)


def squeeze_features(params: Params, x: Array) -> List[Array]:
    """x: (B,H,W,3) in [-1,1] AFTER the lpips scaling layer. Returns 7 taps."""
    taps = []
    h = jax.nn.relu(_conv(params["conv0"], x, stride=2, padding="VALID"))
    taps.append(h)  # relu1
    h = _maxpool_ceil(h)
    h = _fire(params["fires"][0], h)
    h = _fire(params["fires"][1], h)
    taps.append(h)  # relu2 (after fire 4)
    h = _maxpool_ceil(h)
    h = _fire(params["fires"][2], h)
    h = _fire(params["fires"][3], h)
    taps.append(h)  # relu3 (after fire 7)
    h = _maxpool_ceil(h)
    h = _fire(params["fires"][4], h)
    taps.append(h)  # relu4 (after fire 9)
    h = _fire(params["fires"][5], h)
    taps.append(h)  # relu5 (after fire 10)
    h = _fire(params["fires"][6], h)
    taps.append(h)  # relu6 (after fire 11)
    h = _fire(params["fires"][7], h)
    taps.append(h)  # relu7 (after fire 12)
    return taps


def _unit_normalize(f: Array, eps: float = 1e-10) -> Array:
    norm = jnp.sqrt(jnp.sum(f.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
    return f / (norm + eps)


def lpips(params: Params, img0: Array, img1: Array) -> Array:
    """img0/img1: (B,H,W,3) in [-1,1]. Returns the scalar LPIPS distance."""
    x0 = (img0 - SHIFT) / SCALE
    x1 = (img1 - SHIFT) / SCALE
    f0 = squeeze_features(params, x0)
    f1 = squeeze_features(params, x1)
    total = jnp.zeros((), jnp.float32)
    for t0, t1, lin in zip(f0, f1, params["lins"]):
        d = (_unit_normalize(t0) - _unit_normalize(t1)) ** 2
        head = jax.lax.conv_general_dilated(
            d.astype(jnp.float32), lin["kernel"].astype(jnp.float32), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        total = total + jnp.mean(head, axis=(1, 2, 3)).sum()
    return total
