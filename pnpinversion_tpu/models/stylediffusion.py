"""StyleDiffusion mapping networks.

Parity: /root/reference/models/stylediffusion/utils.py:541-613 (Trainer):
per-timestep stacks {conv_start Conv1d(197->154,k1), BLOCK_NUM x [Conv1d(154
->154,k1) + BatchNorm1d(154, batch stats) + LeakyReLU], conv_end} mapping the
CLIP ViT-B/16 image tokens (1,197,768) to a (1,154,768) tensor whose halves
scale/shift the text context for the V projection:
``context * emb[:77] + emb[77:]`` (forward_embed, :603-608).

All T=50 per-step networks are stored stacked on a leading T axis so a traced
step index selects the active one inside scans.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]

MAX_WORDS = 77
SCALE = 2  # emb rows = 77 * scale


def init_mapper_params(key, num_steps: int, tokens_in: int = 197,
                       block_num: int = 1, width: int = 768) -> Params:
    """Stacked per-step mapper params. Conv1d(k=1) == token-axis matmul."""
    tokens_out = MAX_WORDS * SCALE
    ks = iter(jax.random.split(key, 4 + 2 * block_num))

    def conv1d(k, cin, cout):
        s = (1.0 / cin) ** 0.5
        return {
            "kernel": jax.random.uniform(k, (num_steps, cout, cin), jnp.float32, -s, s),
            "bias": jnp.zeros((num_steps, cout)),
        }

    p: Params = {
        "conv_start": conv1d(next(ks), tokens_in, tokens_out),
        "blocks": [],
        "conv_end": conv1d(next(ks), tokens_out, tokens_out),
    }
    for _ in range(block_num):
        p["blocks"].append({
            "conv": conv1d(next(ks), tokens_out, tokens_out),
            "bn_scale": jnp.ones((num_steps, tokens_out)),
            "bn_bias": jnp.zeros((num_steps, tokens_out)),
        })
    return p


def mapper_at_step(params: Params, step: Array) -> Params:
    """Select one step's parameters from the stacked tree."""
    return jax.tree.map(lambda a: a[step], params)


def _conv1d(p, x):
    """x: (B, Cin, D); kernel (Cout, Cin)."""
    return jnp.einsum("oi,bid->bod", p["kernel"], x) + p["bias"][None, :, None]


def _batchnorm1d(scale, bias, x, eps: float = 1e-5):
    """Batch-statistics norm over (B, D) per channel (train-mode BatchNorm1d;
    the reference keeps the modules in .train() even at edit time)."""
    mean = x.mean(axis=(0, 2), keepdims=True)
    var = x.var(axis=(0, 2), keepdims=True)
    xn = (x - mean) * jax.lax.rsqrt(var + eps)
    return xn * scale[None, :, None] + bias[None, :, None]


def mapper_apply(step_params: Params, img_tokens: Array) -> Array:
    """img_tokens (B, 197, width) -> (B, 154, width)."""
    h = _conv1d(step_params["conv_start"], img_tokens)
    for blk in step_params["blocks"]:
        h = _conv1d(blk["conv"], h)
        h = _batchnorm1d(blk["bn_scale"], blk["bn_bias"], h)
        h = jax.nn.leaky_relu(h, negative_slope=0.01)
    return _conv1d(step_params["conv_end"], h)


def forward_embed(step_params: Params, context: Array, img_tokens: Array) -> Array:
    """context (B, 77, width) -> mapped V-context (utils.py:603-608)."""
    emb = mapper_apply(step_params, img_tokens)
    return context * emb[:, :MAX_WORDS, :] + emb[:, MAX_WORDS:, :]
