"""Functional CLIP text encoder (ViT-L/14 text tower for SD1.x; OpenCLIP-H
shape for SD2.x via config).

Parity: HF transformers ``CLIPTextModel`` — the `text_encoder` every
reference pipeline calls (e.g. /root/reference/models/p2p/inversion.py:291-306).
Returns the final-layer hidden states (the reference uses output[0]).
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from pnpinversion_tpu.configs import CLIPTextConfig
from pnpinversion_tpu.models.layers import (
    init_linear,
    init_norm,
    layer_norm,
    linear,
    quick_gelu,
)

Array = jax.Array
Params = Dict[str, Any]


def init_clip_text_params(key, config: CLIPTextConfig = CLIPTextConfig()) -> Params:
    keys = iter(jax.random.split(key, 16 + 8 * config.layers))
    w = config.width
    params: Params = {
        "token_embedding": jax.random.normal(next(keys), (config.vocab_size, w)) * 0.02,
        "position_embedding": jax.random.normal(next(keys), (config.max_length, w)) * 0.01,
        "final_layer_norm": init_norm(w),
        "layers": [],
    }
    for _ in range(config.layers):
        params["layers"].append(
            {
                "layer_norm1": init_norm(w),
                "q_proj": init_linear(next(keys), w, w),
                "k_proj": init_linear(next(keys), w, w),
                "v_proj": init_linear(next(keys), w, w),
                "out_proj": init_linear(next(keys), w, w),
                "layer_norm2": init_norm(w),
                "fc1": init_linear(next(keys), w, w * 4),
                "fc2": init_linear(next(keys), w * 4, w),
            }
        )
    return params


def clip_text_apply(
    params: Params,
    input_ids: Array,
    config: CLIPTextConfig = CLIPTextConfig(),
    dtype=jnp.float32,
) -> Array:
    """input_ids (B, 77) int32 -> last hidden state (B, 77, width)."""
    b, s = input_ids.shape
    h = params["token_embedding"][input_ids].astype(dtype)
    h = h + params["position_embedding"][:s].astype(dtype)

    heads = config.heads
    head_dim = config.width // heads
    scale = head_dim**-0.5
    causal = jnp.triu(jnp.full((s, s), -jnp.inf, dtype=jnp.float32), k=1)

    act = quick_gelu if config.activation == "quick_gelu" else (
        lambda x: jax.nn.gelu(x, approximate=False)
    )

    for lp in params["layers"]:
        res = h
        x = layer_norm(lp["layer_norm1"], h)
        q = linear(lp["q_proj"], x).reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)
        k = linear(lp["k_proj"], x).reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)
        v = linear(lp["v_proj"], x).reshape(b, s, heads, head_dim).transpose(0, 2, 1, 3)
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        scores = scores.astype(jnp.float32) * scale + causal
        probs = jax.nn.softmax(scores, axis=-1).astype(dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, config.width)
        h = res + linear(lp["out_proj"], attn)

        res = h
        x = layer_norm(lp["layer_norm2"], h)
        h = res + linear(lp["fc2"], act(linear(lp["fc1"], x)))

    return layer_norm(params["final_layer_norm"], h)
