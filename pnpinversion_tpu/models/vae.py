"""Functional AutoencoderKL (SD VAE), NHWC.

Parity: HF diffusers AutoencoderKL as loaded by the reference pipelines
(e.g. /root/reference/models/p2p_editor.py:18-25). The benchmark path only
ever uses `encode(...).latent_dist.mean` and `decode`
(/root/reference/utils/utils.py:58-80), so sampling the posterior is exposed
but optional.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pnpinversion_tpu.configs import VAEConfig
from pnpinversion_tpu.models.layers import (
    conv2d,
    group_norm,
    init_conv,
    init_linear,
    init_norm,
    linear,
    nearest_upsample_2x,
    silu,
)

Array = jax.Array
Params = Dict[str, Any]


def _init_resnet(key, in_ch: int, out_ch: int) -> Params:
    ks = jax.random.split(key, 3)
    p: Params = {
        "norm1": init_norm(in_ch),
        "conv1": init_conv(ks[0], in_ch, out_ch, 3),
        "norm2": init_norm(out_ch),
        "conv2": init_conv(ks[1], out_ch, out_ch, 3),
    }
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv(ks[2], in_ch, out_ch, 1)
    return p


def _init_attn(key, ch: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "group_norm": init_norm(ch),
        "to_q": init_linear(ks[0], ch, ch),
        "to_k": init_linear(ks[1], ch, ch),
        "to_v": init_linear(ks[2], ch, ch),
        "to_out": init_linear(ks[3], ch, ch),
    }


def init_vae_params(key, config: VAEConfig = VAEConfig()) -> Params:
    chs = config.block_out_channels
    n = len(chs)
    keys = iter(jax.random.split(key, 512))
    lat = config.latent_channels

    enc: Params = {"conv_in": init_conv(next(keys), config.in_channels, chs[0], 3)}
    blocks = []
    out_ch = chs[0]
    for i in range(n):
        in_ch, out_ch = out_ch, chs[i]
        blk = {"resnets": [
            _init_resnet(next(keys), in_ch if j == 0 else out_ch, out_ch)
            for j in range(config.layers_per_block)
        ]}
        if i < n - 1:
            blk["downsample"] = init_conv(next(keys), out_ch, out_ch, 3)
        blocks.append(blk)
    enc["down_blocks"] = blocks
    enc["mid"] = {
        "resnet_1": _init_resnet(next(keys), chs[-1], chs[-1]),
        "attn": _init_attn(next(keys), chs[-1]),
        "resnet_2": _init_resnet(next(keys), chs[-1], chs[-1]),
    }
    enc["norm_out"] = init_norm(chs[-1])
    enc["conv_out"] = init_conv(next(keys), chs[-1], 2 * lat, 3)

    dec: Params = {"conv_in": init_conv(next(keys), lat, chs[-1], 3)}
    dec["mid"] = {
        "resnet_1": _init_resnet(next(keys), chs[-1], chs[-1]),
        "attn": _init_attn(next(keys), chs[-1]),
        "resnet_2": _init_resnet(next(keys), chs[-1], chs[-1]),
    }
    ublocks = []
    rev = list(reversed(chs))
    prev = rev[0]
    for i in range(n):
        out_ch_u = rev[i]
        blk = {"resnets": [
            _init_resnet(next(keys), prev if j == 0 else out_ch_u, out_ch_u)
            for j in range(config.layers_per_block + 1)
        ]}
        if i < n - 1:
            blk["upsample"] = init_conv(next(keys), out_ch_u, out_ch_u, 3)
        ublocks.append(blk)
        prev = out_ch_u
    dec["up_blocks"] = ublocks
    dec["norm_out"] = init_norm(chs[0])
    dec["conv_out"] = init_conv(next(keys), chs[0], config.in_channels, 3)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": init_conv(next(keys), 2 * lat, 2 * lat, 1),
        "post_quant_conv": init_conv(next(keys), lat, lat, 1),
    }


def _vae_attention(p: Params, x: Array, groups: int) -> Array:
    b, h, w, c = x.shape
    hs = group_norm(p["group_norm"], x, groups, eps=1e-6)
    hs = hs.reshape(b, h * w, c)
    q = linear(p["to_q"], hs)
    k = linear(p["to_k"], hs)
    v = linear(p["to_v"], hs)
    scores = jnp.einsum("bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32) * (c**-0.5), axis=-1).astype(x.dtype)
    out = jnp.einsum("bqk,bkc->bqc", probs, v)
    out = linear(p["to_out"], out)
    return x + out.reshape(b, h, w, c)


def _mid(p: Params, x: Array, groups: int) -> Array:
    x = _resnet(p["resnet_1"], x, groups)
    x = _vae_attention(p["attn"], x, groups)
    return _resnet(p["resnet_2"], x, groups)


def _resnet(p: Params, x: Array, groups: int) -> Array:
    h = group_norm(p["norm1"], x, groups, eps=1e-6)
    h = conv2d(p["conv1"], silu(h))
    h = group_norm(p["norm2"], h, groups, eps=1e-6)
    h = conv2d(p["conv2"], silu(h))
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x)
    return x + h


def vae_encode_moments(params: Params, image: Array, config: VAEConfig = VAEConfig()) -> Tuple[Array, Array]:
    """image (B,H,W,3) in [-1,1] -> (mean, logvar) each (B,h,w,4)."""
    g = config.norm_groups
    p = params["encoder"]
    h = conv2d(p["conv_in"], image)
    for blk in p["down_blocks"]:
        for rn in blk["resnets"]:
            h = _resnet(rn, h, g)
        if "downsample" in blk:
            # diffusers VAE Downsample2D uses asymmetric (0,1) padding
            h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
            h = conv2d(blk["downsample"], h, stride=2, padding="VALID")
    h = _mid(p["mid"], h, g)
    h = group_norm(p["norm_out"], h, g, eps=1e-6)
    h = conv2d(p["conv_out"], silu(h))
    moments = conv2d(params["quant_conv"], h)
    mean, logvar = jnp.split(moments, 2, axis=-1)
    return mean, jnp.clip(logvar, -30.0, 20.0)


def vae_encode(params: Params, image: Array, config: VAEConfig = VAEConfig(),
               rng: Optional[Array] = None, scale: bool = True) -> Array:
    """Posterior mean (or sample when rng given), scaled by scaling_factor.

    Matches utils/utils.py:68-80 (mean, x0.18215).
    """
    mean, logvar = vae_encode_moments(params, image, config)
    z = mean
    if rng is not None:
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(rng, mean.shape, mean.dtype)
    return z * config.scaling_factor if scale else z


def vae_decode(params: Params, latents: Array, config: VAEConfig = VAEConfig(),
               scale: bool = True) -> Array:
    """latents (B,h,w,4) -> image (B,H,W,3) in [-1,1].

    Matches utils/utils.py:58-66 (x 1/0.18215 then decode).
    """
    g = config.norm_groups
    if scale:
        latents = latents / config.scaling_factor
    z = conv2d(params["post_quant_conv"], latents)
    p = params["decoder"]
    h = conv2d(p["conv_in"], z)
    h = _mid(p["mid"], h, g)
    for blk in p["up_blocks"]:
        for rn in blk["resnets"]:
            h = _resnet(rn, h, g)
        if "upsample" in blk:
            h = nearest_upsample_2x(h)
            h = conv2d(blk["upsample"], h)
    h = group_norm(p["norm_out"], h, g, eps=1e-6)
    return conv2d(p["conv_out"], silu(h))


def image_to_latent(params: Params, image_uint8: Array, config: VAEConfig = VAEConfig(),
                    dtype=jnp.float32) -> Array:
    """uint8 (B,H,W,3) or (H,W,3) -> scaled latent. Fuses normalization on device."""
    if image_uint8.ndim == 3:
        image_uint8 = image_uint8[None]
    img = image_uint8.astype(dtype) / 127.5 - 1.0
    return vae_encode(params, img, config)


def latent_to_image(params: Params, latents: Array, config: VAEConfig = VAEConfig()) -> Array:
    """scaled latent -> uint8 (B,H,W,3). Fuses denorm/clamp on device."""
    img = vae_decode(params, latents, config)
    img = jnp.clip(img / 2 + 0.5, 0.0, 1.0)
    return (img * 255).astype(jnp.uint8)
