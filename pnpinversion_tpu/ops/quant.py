"""Opt-in weight-only int8 (w8) storage for the UNet's weights.

What was measured on the v5e (scripts/microbench_int8.py +
scripts/profile_quant.py, 50-step b=3 fused directinversion+p2p scan,
512px, device time from xprof):

- dynamic w8a8 (per-token int8 activations feeding int8 MXU dots) is
  REFUTED end to end despite the int8 MXU running the isolated dots
  1.7-1.96x faster than bf16: the per-token absmax re-reads every
  activation the producer just wrote (+147 ms of reduce_max per scan) and
  the quantize/rescale elementwise inflates the surrounding fusions
  (+270 ms attributed to conv fusions), netting 1765 ms vs 1554 ms bf16
  (+13%). Sharing one activation quantization across q/k/v changed
  nothing — XLA had already CSE'd the identical absmax expressions.
- weight-only int8 (this module) WINS: 1484 ms vs 1554 ms (-4.5%).
  Weights are stored int8 with per-output-channel scales and dequantized
  into the dot/conv operand read (int8->bf16 convert fuses; the scale is
  folded into the output epilogue), so the MXU still runs bf16 — the win
  is halved weight HBM traffic, which also grows at smaller batch (the
  b=1 inversion phase reads the same bytes for a third of the FLOPs).
- extending w8 to the 3x3 conv kernels is NEUTRAL (1489 ms, within
  noise of 1484; conv pool 493 -> 503 ms): XLA's conv weight read does
  not benefit from the int8 storage the way its dot operand read does,
  so ``quantize_unet_dots`` defaults to matmul weights only
  (``convs=True`` keeps the option measurable).

Layout: ``kernel_w8`` (int8, original kernel rank; 1x1 convs flattened to
(in, out) so they dispatch as per-pixel matmuls) + ``kernel_scale``
(f32, per output channel). ``models.layers.linear`` / ``conv2d`` dispatch
on the key. Gradients w.r.t. activations flow through the dequantized
weights natively (int8 leaves are autodiff constants); UNet weights are
never optimized anywhere in the framework.

This is an OPT-IN mode (``PNPI_QUANT=w8`` / ``--quant w8``): the <1%
per-weight rounding error sits below the bf16 activation noise floor in
every tiny-config check, but it deviates from the reference's fp numerics
by construction and must be validated on real weights on weight day
(zero-egress here). It is excluded from the headline bench number;
``bench.py`` reports it as a secondary metric.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

Array = jax.Array
Params = Dict[str, Any]

_EPS = 1e-8


def quantize_linear_params(p: Params) -> Params:
    """{"kernel": (in,out) float[, "bias"]} -> weight-only int8 layout."""
    w = p["kernel"].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0), _EPS) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out: Params = {"kernel_w8": q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_conv_params(p: Params) -> Params:
    """{"kernel": (kh,kw,in,out) float[, "bias"]} -> weight-only int8.

    1x1 kernels are flattened to the (in, out) linear layout — a stride-1
    SAME 1x1 conv over NHWC is exactly a per-pixel matmul, and the explicit
    dot measures faster than the conv lowering. kxk kernels keep their rank
    (``layers.conv2d`` dequantizes into the conv's weight operand)."""
    kh, kw, cin, cout = p["kernel"].shape
    if kh == 1 and kw == 1:
        flat = {"kernel": p["kernel"].reshape(cin, cout)}
        if "bias" in p:
            flat["bias"] = p["bias"]
        return quantize_linear_params(flat)
    w = p["kernel"].astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), _EPS) / 127.0
    q = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    out: Params = {"kernel_w8": q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def qlinear(p: Params, x: Array) -> Array:
    """Weight-only int8 linear: bf16 MXU over dequantized-in-read weights,
    per-output-channel scale folded into the output epilogue."""
    y = jnp.dot(x, p["kernel_w8"].astype(x.dtype),
                preferred_element_type=x.dtype)
    y = y * p["kernel_scale"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def _is_conv(p) -> bool:
    return (isinstance(p, dict) and "kernel" in p
            and getattr(p["kernel"], "ndim", 0) == 4)


def _quantize_attention(p: Params) -> Params:
    return {k: (quantize_linear_params(v) if k.startswith("to_") else v)
            for k, v in p.items()}


def _quantize_tblock(p: Params) -> Params:
    out = dict(p)
    out["attn1"] = _quantize_attention(p["attn1"])
    out["attn2"] = _quantize_attention(p["attn2"])
    out["ff"] = {k: quantize_linear_params(v) for k, v in p["ff"].items()}
    return out


def quantize_unet_dots(unet: Params, convs: bool = False) -> Params:
    """w8-quantize a UNet param tree: every transformer-block linear
    (attention projections + FFN) and every 1x1 conv (proj_in/proj_out,
    resnet conv_shortcut — flattened to matmuls). ``convs=True`` also
    quantizes the kxk convs (resnet conv1/conv2, conv_in/conv_out,
    up/downsamplers) — measured NEUTRAL on the fused scan (module
    docstring), so off by default. Norms and the time-embedding MLP stay
    float (tiny, and the global time conditioning is kept at full
    precision). Returns a new tree; the input is unchanged."""

    def walk(p):
        if isinstance(p, dict):
            if "blocks" in p:  # transformer2d
                out = dict(p)
                out["blocks"] = [_quantize_tblock(b) for b in p["blocks"]]
                for k in ("proj_in", "proj_out"):
                    if _is_conv(out.get(k)):
                        out[k] = quantize_conv_params(out[k])
                return out
            quant_keys = ("conv_shortcut",) if not convs else (
                "conv_shortcut", "conv1", "conv2", "conv_in", "conv_out",
                "downsample", "upsample")
            return {k: (quantize_conv_params(v)
                        if k in quant_keys and _is_conv(v) else walk(v))
                    for k, v in p.items()}
        if isinstance(p, list):
            return [walk(v) for v in p]
        return p

    return walk(unet)


def is_quantized(unet: Params) -> bool:
    found = []
    jax.tree_util.tree_map_with_path(
        lambda path, _: found.append(True)
        if any(getattr(k, "key", None) == "kernel_w8" for k in path) else None,
        unet,
    )
    return bool(found)
