"""Pallas TPU flash attention (forward-only; the editing framework never
backprops through the big self-attention).

Used for the uncontrolled attention sites — above all the 64x64 latent
self-attention (seq 4096), where materializing (B*H, 4096, 4096) scores to
HBM is the reference design's single biggest memory-bandwidth cost. Online
softmax over K/V tiles keeps everything in VMEM.

Head dims in SD UNets are 40/80/160 (not lane-aligned); the wrapper pads the
head dimension to a multiple of 128 with zeros (exact: zero-padded q/k leave
the logits unchanged, zero-padded v rows contribute nothing).
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# tuned on v5e for the SD1.4 64x64 self-attention (B8,H8,S4096,D40->128):
# (256,512)=6.5ms, (512,512)=5.8ms, (512,1024)=5.5ms vs einsum 14.1ms
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, block_k: int,
                  seq_k: int):
    # keep q/k/v in their storage dtype (bf16 on TPU): the MXU runs
    # bf16xbf16->f32 at full rate, while f32 inputs fall to the slow path.
    # Softmax statistics stay f32; probs are cast back to the value dtype
    # for the PV matmul — identical semantics to the einsum path
    # (ops/attention.py apply_probs) and the reference's torch softmax.
    q = q_ref[0]  # (block_q, d)
    block_q, d = q.shape
    num_kv = seq_k // block_k

    def body(j, carry):
        o_acc, m, l = carry
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (block_q, block_k) f32
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        o_new = alpha * o_acc + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return o_new, m_new, l_new

    o0 = jnp.zeros((block_q, d), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    o, _, l = jax.lax.fori_loop(0, num_kv, body, (o0, m0, l0))
    o_ref[0] = (o / l).astype(o_ref.dtype)


def _pad_to(x: Array, axis: int, multiple: int) -> Array:
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


@functools.partial(jax.jit, static_argnames=("scale", "block_q", "block_k",
                                             "interpret"))
def flash_attention(q: Array, k: Array, v: Array, scale: float,
                    block_q: int = DEFAULT_BLOCK_Q,
                    block_k: int = DEFAULT_BLOCK_K,
                    interpret: bool = False) -> Array:
    """q,k,v: (B, H, S, D) -> (B, H, S, D). Non-causal softmax attention."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    orig_dtype = q.dtype

    # SD head dims (40/80/160) are not lane-aligned. When D is a sublane
    # multiple, hand the unpadded arrays to Mosaic: the implicit lane padding
    # of VMEM loads is zero-filled (verified exact vs the einsum path on
    # hardware; regression-tested in tests/test_flash_attention.py's
    # TPU-gated case), which keeps the QK logits and PV products unchanged
    # while skipping three HBM pad materializations and the output slice.
    # Mosaic does not document the zero-fill, so PNPI_FLASH_EXPLICIT_PAD=1 is
    # the escape hatch if a future jaxlib breaks it. The interpreter (CPU
    # tests) has no such tiling, so pad explicitly there.
    explicit_pad = os.environ.get("PNPI_FLASH_EXPLICIT_PAD") == "1"
    if d % 8 == 0 and not interpret and not explicit_pad:
        d_pad = d
    else:
        d_pad = max(128, ((d + 127) // 128) * 128)
    if d != d_pad:
        q = _pad_to(q, 3, d_pad)
        k = _pad_to(k, 3, d_pad)
        v = _pad_to(v, 3, d_pad)

    qf = q.reshape(b * h, sq, d_pad)
    kf = k.reshape(b * h, sk, d_pad)
    vf = v.reshape(b * h, sk, d_pad)

    grid = (b * h, sq // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, block_k=block_k, seq_k=sk),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d_pad), orig_dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d_pad,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf)

    out = out.reshape(b, h, sq, d_pad)
    return out[..., :d]
