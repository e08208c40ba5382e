"""Opt-in int8 (w8a8) path for the UNet's transformer matmuls.

The v5e MXU runs int8xint8->int32 at 2x the bf16 rate, and XLA lowers
``dot_general`` (NOT conv) to that path — measured 1.7-1.96x at the SD1.4
projection/FFN shapes (scripts/microbench_int8.py; int8 conv measured
neutral, so convs stay bf16). The UNet's dot_general pool is ~20% of the
fused-scan device time, so this buys a high-single-digit percent end to end.

Scheme (standard dynamic w8a8):
- weights: symmetric per-output-channel int8, quantized ONCE
  (``quantize_unet_dots``) into a parallel param layout that
  ``models.layers.linear`` dispatches on (``kernel_q8`` + ``kernel_scale``);
- activations: symmetric per-token (last-dim abs-max) int8, quantized
  dynamically in f32 at each call;
- the int32 product is rescaled by (act_scale x weight_scale) in f32 and
  cast back to the activation dtype.

Backward (null-text / pix2pix-zero / StyleDiffusion differentiate through
the UNet w.r.t. latents and context): a ``jax.custom_vjp`` computes input
cotangents against the *dequantized* weights with a straight-through
activation estimator. UNet weights are never optimized anywhere in the
framework, so weight cotangents are zero.

This is an OPT-IN performance mode (``PNPI_QUANT=int8`` / ``--quant int8``):
it deviates from the reference's fp numerics by design, and its metric
impact must be validated on real weights on weight day (zero-egress here).
It is excluded from the headline bench number; ``bench.py`` reports it as a
secondary metric.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]

_EPS = 1e-8


def quantize_linear_params(p: Params) -> Params:
    """{"kernel": (in,out) float[, "bias"]} -> int8 layout for ``qlinear``."""
    w = p["kernel"].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), _EPS) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out: Params = {"kernel_q8": q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


@jax.custom_vjp
def _qdot(x: Array, wq: Array, wscale: Array) -> Array:
    """(..., in) x int8 (in, out) -> (..., out), int8 MXU forward.

    All quantization math stays in the activation dtype (bf16 on TPU) and
    the dot accumulates straight to f32: the first formulation (f32 quant
    math + int32 dot output) materialized f32/int32 copies of every
    activation to HBM and perturbed XLA's conv fusions — measured SLOWER
    end to end than bf16 despite a 2.4x faster dot (see
    docs/PERFORMANCE.md int8 ledger entry). The bf16 reciprocal-scale
    multiply costs <=0.4% extra quantization-grid error, far below the
    int8 noise floor."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    recip = (127.0 / jnp.maximum(amax.astype(jnp.float32), _EPS)).astype(x.dtype)
    xq = jnp.clip(jnp.round(x * recip), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ascale = jnp.maximum(amax.astype(jnp.float32), _EPS) / 127.0
    return (y * ascale * wscale).astype(x.dtype)


def _qdot_fwd(x, wq, wscale):
    return _qdot(x, wq, wscale), (x, wq, wscale)


def _qdot_bwd(res, g):
    x, wq, wscale = res
    w_deq = wq.astype(jnp.float32) * wscale  # (in, out)
    dx = jax.lax.dot_general(
        g.astype(jnp.float32), w_deq,
        dimension_numbers=(((g.ndim - 1,), (1,)), ((), ())),
    ).astype(x.dtype)
    return dx, jnp.zeros_like(wq), jnp.zeros_like(wscale)


_qdot.defvjp(_qdot_fwd, _qdot_bwd)


def qlinear(p: Params, x: Array) -> Array:
    y = _qdot(x, p["kernel_q8"], p["kernel_scale"])
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _quantize_attention(p: Params) -> Params:
    return {k: (quantize_linear_params(v) if k.startswith("to_") else v)
            for k, v in p.items()}


def _quantize_tblock(p: Params) -> Params:
    out = dict(p)
    out["attn1"] = _quantize_attention(p["attn1"])
    out["attn2"] = _quantize_attention(p["attn2"])
    out["ff"] = {k: quantize_linear_params(v) for k, v in p["ff"].items()}
    return out


def quantize_unet_dots(unet: Params) -> Params:
    """int8-quantize every transformer-block linear (attention projections +
    FFN) of a UNet param tree; convs, norms, and time embeddings stay float
    (int8 conv measured no faster, and the global time conditioning is kept
    at full precision). Returns a new tree; the input is unchanged."""

    def walk(p):
        if isinstance(p, dict):
            if "blocks" in p:  # transformer2d
                out = dict(p)
                out["blocks"] = [_quantize_tblock(b) for b in p["blocks"]]
                return out
            return {k: walk(v) for k, v in p.items()}
        if isinstance(p, list):
            return [walk(v) for v in p]
        return p

    return walk(unet)


def is_quantized(unet: Params) -> bool:
    found = []
    jax.tree_util.tree_map_with_path(
        lambda path, _: found.append(True)
        if any(getattr(k, "key", None) == "kernel_q8" for k in path) else None,
        unet,
    )
    return bool(found)
