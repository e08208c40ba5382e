"""Attention ops: fused (Pallas flash on TPU / XLA elsewhere) and
probs-materializing paths, plus the control dispatch used by the UNet.

Where the reference computes full (B*h, Sq, Sk) score matrices for every
attention (attention_control.py:34-45) so Python hooks can see them, we only
materialize probs at sites whose controller actually edits or records maps
(cross-attn and ≤32² self-attn); everything else — in particular the 4096-seq
64x64 self-attention, the FLOPs hot spot — goes through the fused kernel.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pnpinversion_tpu.control.base import AttnSite, BaseControl, NO_CONTROL

Array = jax.Array


def split_heads(x: Array, heads: int) -> Array:
    """(B, S, C) -> (B, H, S, D)."""
    b, s, c = x.shape
    return x.reshape(b, s, heads, c // heads).transpose(0, 2, 1, 3)


def merge_heads(x: Array) -> Array:
    """(B, H, S, D) -> (B, S, C)."""
    b, h, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * d)


def attention_probs(q: Array, k: Array, scale: float) -> Array:
    """Softmax attention probabilities in fp32. q,k: (B,H,S,D)."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores.astype(jnp.float32) * scale
    return jax.nn.softmax(scores, axis=-1)


def apply_probs(probs: Array, v: Array) -> Array:
    return jnp.einsum(
        "bhqk,bhkd->bhqd", probs.astype(v.dtype), v, preferred_element_type=v.dtype
    )


def fused_attention(q: Array, k: Array, v: Array, scale: float) -> Array:
    """Fused attention without materializing probs to HBM.

    On TPU this dispatches to the Pallas flash kernel for long sequences;
    otherwise (CPU tests, tiny shapes) an einsum that XLA fuses.
    """
    if _use_pallas(q, k):
        # measured vs jax.experimental.pallas.ops.tpu.flash_attention on v5e
        # at SD shapes (b4-8, s4096, d40): this kernel is ~7x faster (the
        # stock kernel's block/pipeline choices don't fit small head dims)
        from pnpinversion_tpu.ops.flash_attention import flash_attention

        return flash_attention(q, k, v, scale)
    probs = attention_probs(q, k, scale)
    return apply_probs(probs, v)


def _use_pallas(q: Array, k: Array) -> bool:
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    s, sk = q.shape[2], k.shape[2]
    # flash pays off for long self-attention; the head dim is zero-padded to
    # lane width inside the kernel (exact), but the KV sequence must tile
    return s >= 1024 and s % 128 == 0 and sk % 128 == 0


def controlled_attention(
    params,
    x: Array,
    context: Optional[Array],
    site: AttnSite,
    control: BaseControl = NO_CONTROL,
    tensors=None,
    state=None,
    step: Optional[Array] = None,
) -> Tuple[Array, dict]:
    """One UNet attention call with the control dispatch.

    params: {'to_q','to_k','to_v','to_out'} linear param dicts.
    x: (B, S, C) hidden states; context: (B, Sk, Ctx) or None for self-attn.
    """
    from pnpinversion_tpu.models.layers import linear

    is_cross = context is not None
    ctx = context if is_cross else x
    heads = site.heads
    if state is None:
        state = {}
    if tensors is None:
        tensors = {}
    q = split_heads(linear(params["to_q"], x), heads)
    k = split_heads(linear(params["to_k"], ctx.astype(x.dtype)), heads)
    ctx_v = control.value_context_hook(site, ctx, tensors, state, step)
    v = split_heads(linear(params["to_v"], ctx_v.astype(x.dtype)), heads)
    scale = (q.shape[-1]) ** -0.5

    override = control.attention_override(site, q, k, v, scale, tensors, state, step)
    if override is not None:
        out, state = override
        out = linear(params["to_out"], merge_heads(out))
        return out, state

    q, k, v = control.qkv_hook(site, q, k, v, tensors, state, step)

    if control.needs_probs(site):
        probs = attention_probs(q, k, scale)
        probs, state = control.probs_hook(site, probs, tensors, state, step)
        out = apply_probs(probs, v)
    else:
        out = fused_attention(q, k, v, scale)

    out = linear(params["to_out"], merge_heads(out))
    return out, state
