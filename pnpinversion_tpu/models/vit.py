"""Functional Vision Transformers used by the evaluator:

- CLIP ViT-L/14 vision tower (for CLIPScore; reference loads
  "openai/clip-vit-large-patch14" via torchmetrics CLIPScore,
  matrics_calculator.py:274) plus the joint text/image projection heads.
- DINO ViT-B/8 (torch.hub facebookresearch/dino) for the structure distance:
  the metric needs the layer-11 qkv linear outputs
  (matrics_calculator.py:133-171), so the forward exposes per-layer qkv.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from pnpinversion_tpu.models.layers import (
    init_linear,
    init_norm,
    layer_norm,
    linear,
    quick_gelu,
)

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    # CLIP: pre/post layernorm + projection; DINO: no class projection
    style: str = "clip"  # 'clip' | 'dino'
    projection_dim: int = 768
    activation: str = "quick_gelu"  # dino uses exact gelu

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


CLIP_VIT_L14 = ViTConfig()
DINO_VITB8 = ViTConfig(patch_size=8, width=768, layers=12, heads=12,
                       style="dino", activation="gelu")
TINY_VIT = ViTConfig(image_size=32, patch_size=8, width=32, layers=2, heads=2,
                     projection_dim=16)


def init_vit_params(key, cfg: ViTConfig) -> Params:
    keys = iter(jax.random.split(key, 16 + 8 * cfg.layers))
    w = cfg.width
    p: Params = {
        "patch_embed": jax.random.normal(next(keys), (cfg.patch_size, cfg.patch_size, 3, w)) * 0.02,
        "cls_token": jax.random.normal(next(keys), (1, 1, w)) * 0.02,
        "pos_embed": jax.random.normal(next(keys), (1, cfg.num_patches + 1, w)) * 0.02,
        "layers": [],
    }
    if cfg.style == "clip":
        p["pre_layernorm"] = init_norm(w)
        p["post_layernorm"] = init_norm(w)
        p["projection"] = init_linear(next(keys), w, cfg.projection_dim, use_bias=False)
    else:
        p["norm"] = init_norm(w)
    for _ in range(cfg.layers):
        lp = {
            "ln1": init_norm(w),
            "qkv": init_linear(next(keys), w, 3 * w),
            "out_proj": init_linear(next(keys), w, w),
            "ln2": init_norm(w),
            "fc1": init_linear(next(keys), w, 4 * w),
            "fc2": init_linear(next(keys), 4 * w, w),
        }
        p["layers"].append(lp)
    return p


def _interp_pos_embed(pos: Array, n_patches: int, width: int) -> Array:
    """DINO-style bicubic interpolation of position embeddings when the
    input resolution differs from training (e.g. 224/8=28 vs trained 28)."""
    n_trained = pos.shape[1] - 1
    if n_trained == n_patches:
        return pos
    side_t = int(n_trained**0.5)
    side = int(n_patches**0.5)
    grid = pos[:, 1:].reshape(side_t, side_t, width)
    grid = jax.image.resize(grid, (side, side, width), method="bicubic")
    return jnp.concatenate([pos[:, :1], grid.reshape(1, side * side, width)], axis=1)


def vit_apply(
    params: Params,
    image: Array,  # (B, H, W, 3) normalized
    cfg: ViTConfig,
    return_qkv: bool = False,
    return_tokens: bool = False,
) -> Tuple[Array, List[Array]]:
    """Returns (pooled_embedding, per-layer qkv outputs [if requested]).

    CLIP: pooled = projection(post_ln(cls of final layer)); with
    ``return_tokens`` the pooled slot instead carries post_ln of ALL tokens
    (B, N+1, width) — the StyleDiffusion image-token interface
    (/root/reference/models/stylediffusion/clip_util.py:29-48).
    DINO: pooled = norm(cls).
    """
    b, h, w, _ = image.shape
    patches = jax.lax.conv_general_dilated(
        image, params["patch_embed"].astype(image.dtype),
        (cfg.patch_size, cfg.patch_size), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    if "patch_bias" in params:  # CLIP's patch conv has no bias; DINO's does
        patches = patches + params["patch_bias"].astype(image.dtype)
    n = patches.shape[1] * patches.shape[2]
    x = patches.reshape(b, n, cfg.width)
    cls = jnp.broadcast_to(params["cls_token"].astype(x.dtype), (b, 1, cfg.width))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _interp_pos_embed(params["pos_embed"], n, cfg.width).astype(x.dtype)
    if cfg.style == "clip":
        x = layer_norm(params["pre_layernorm"], x)

    heads = cfg.heads
    hd = cfg.width // heads
    act = quick_gelu if cfg.activation == "quick_gelu" else (
        lambda z: jax.nn.gelu(z, approximate=False))
    qkv_outputs: List[Array] = []

    for lp in params["layers"]:
        res = x
        z = layer_norm(lp["ln1"], x)
        qkv = linear(lp["qkv"], z)  # (B, N, 3w)
        if return_qkv:
            qkv_outputs.append(qkv)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        k = k.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32) * hd**-0.5
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, -1, cfg.width)
        x = res + linear(lp["out_proj"], attn)
        res = x
        z = layer_norm(lp["ln2"], x)
        x = res + linear(lp["fc2"], act(linear(lp["fc1"], z)))

    if cfg.style == "clip":
        if return_tokens:
            return layer_norm(params["post_layernorm"], x), qkv_outputs
        pooled = layer_norm(params["post_layernorm"], x[:, 0])
        pooled = linear(params["projection"], pooled)
    else:
        if return_tokens:
            return layer_norm(params["norm"], x), qkv_outputs
        pooled = layer_norm(params["norm"], x)[:, 0]
    return pooled, qkv_outputs


def dino_keys_self_sim(params: Params, image: Array, cfg: ViTConfig = DINO_VITB8,
                       layer: int = 11) -> Array:
    """Cosine self-similarity matrix of the given layer's keys, heads
    concatenated (matrics_calculator.py:159-171). image: (1, H, W, 3)."""
    _, qkvs = vit_apply(params, image, cfg, return_qkv=True)
    qkv = qkvs[layer][0]  # (N, 3w)
    n = qkv.shape[0]
    heads = cfg.heads
    hd = cfg.width // heads
    qkv = qkv.reshape(n, 3, heads, hd).transpose(1, 2, 0, 3)
    keys = qkv[1]  # (heads, N, hd)
    concat = keys.transpose(1, 0, 2).reshape(n, heads * hd)
    norm = jnp.linalg.norm(concat, axis=1, keepdims=True)
    factor = jnp.maximum(norm @ norm.T, 1e-8)
    return (concat @ concat.T) / factor


def structure_distance(params: Params, img_gt: Array, img_pred: Array,
                       cfg: ViTConfig = DINO_VITB8, layer: int = 11) -> Array:
    """MSE between layer-11 key self-similarity matrices
    (calculate_global_ssim_loss, matrics_calculator.py:237-246).
    Inputs: (1, 224, 224, 3) already imagenet-normalized (at the reference's
    0..255 scale quirk)."""
    a = dino_keys_self_sim(params, img_gt, cfg, layer)
    b = dino_keys_self_sim(params, img_pred, cfg, layer)
    return jnp.mean((a - b) ** 2)
