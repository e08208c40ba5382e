"""Pallas TPU flash attention with a full custom VJP.

Used for the uncontrolled attention sites — above all the 64x64 latent
self-attention (seq 4096), where materializing (B*H, 4096, 4096) scores to
HBM is the reference design's single biggest memory-bandwidth cost. Online
softmax over K/V tiles keeps everything in VMEM.

The backward pass matters because two inversion engines differentiate
THROUGH the UNet at production shape: null-text optimization's inner Adam
loop (reference models/p2p/inversion.py:308-391) and pix2pix-zero's
cross-attention guidance (src/inversion/pix2pix_zero.py grad step). The
FlashAttention-2 backward runs as two Pallas kernels (dQ over q-blocks;
dK/dV over k-blocks) that recompute the probabilities from the saved
row log-sum-exp — nothing S x S ever touches HBM in either direction.

Head dims in SD UNets are 40/80/160 (not lane-aligned); the wrapper pads the
head dimension to a multiple of 128 with zeros (exact: zero-padded q/k leave
the logits unchanged, zero-padded v rows contribute nothing). On hardware
the pad is usually skipped — see the d % 8 fast path below.
"""
from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Forward blocks, tuned on v5e at the production batch-4 edit-scan shapes
# (12 rows x 8 heads; scripts/tune_flash.py --rows 12, one-dispatch scan
# timing over distinct inputs):
#   sq=4096,d=40: (512,1024) 12.56 ms -> (512,4096) 11.10 ms (-12%);
#                 (1024,4096) fails Mosaic compile (probs block VMEM)
#   sq=1024,d=80: (512,1024)  4.38 ms -> (1024,1024) 3.98 ms (-9%)
# Larger K blocks win because the whole K/V row already sits in VMEM (the
# in_spec block is the full sequence); block_k only sets the inner-loop
# tile, and fewer online-softmax renorm carries + bigger MXU dots beat the
# smaller tiles. Backward keeps the r2-tuned (512,1024): the dq/dkv kernels
# carry extra f32 accumulators per tile, and (512,4096) was not re-tuned
# for them.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024


def _default_blocks(sq: int, sk: int):
    if sq >= 4096:
        return 512, min(sk, 4096)
    return min(sq, 1024), min(sk, 1024)


def _default_bwd_blocks(sq: int, sk: int):
    # the r2-tuned sizes; re-tunable via scripts/tune_flash.py --bwd
    return min(sq, DEFAULT_BLOCK_Q), min(sk, DEFAULT_BLOCK_K)


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float,
                  block_k: int, seq_k: int):
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
    o, m, l = jax.lax.fori_loop(0, num_kv, body, (o0, m0, l0))
    o_ref[0] = (o / l).astype(o_ref.dtype)
    # row log-sum-exp: softmax(s)_ij == exp(s_ij - lse_i); the backward
    # kernels recompute probabilities from it without re-running the
    # online-max recursion. Stored (B*H, 1, S) so the block's trailing two
    # dims (1, block_q) satisfy Mosaic's tiling rule.
    lse_ref[0, 0] = (m + jnp.log(l))[:, 0]


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, scale: float, block_k: int, seq_k: int):
    """dQ = scale * sum_j [P_j * (dO V_j^T - delta)] K_j, one q-block per
    program, streaming K/V blocks (FlashAttention-2 eq. 12-17)."""
    q = q_ref[0]                      # (block_q, d)
    do = do_ref[0]                    # (block_q, d)
    lse = lse_ref[0, 0][:, None]      # (block_q, 1) f32
    delta = delta_ref[0, 0][:, None]  # (block_q, 1) f32
    block_q, d = q.shape
    num_kv = seq_k // block_k

    def body(j, dq_acc):
        k = k_ref[0, pl.ds(j * block_k, block_k), :]
        v = v_ref[0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        p = jnp.exp(s - lse)                                   # (bq, bk) f32
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)                                  # f32
        return dq_acc + jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kv, body, jnp.zeros((block_q, d), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, scale: float, block_q: int,
                          seq_q: int):
    """dV = sum_i P_i^T dO_i;  dK = scale * sum_i dS_i^T Q_i — one k-block
    per program, streaming Q/dO blocks."""
    k = k_ref[0]                      # (block_k, d)
    v = v_ref[0]                      # (block_k, d)
    block_k, d = k.shape
    num_q = seq_q // block_q

    def body(i, carry):
        dk_acc, dv_acc = carry
        q = q_ref[0, pl.ds(i * block_q, block_q), :]
        do = do_ref[0, pl.ds(i * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)][:, None]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale                                              # (bq, bk)
        p = jnp.exp(s - lse)
        # dV += P^T dO  (contract over the q rows)
        dv_acc = dv_acc + jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        dk_acc = dk_acc + jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dk_acc, dv_acc

    z = jnp.zeros((block_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_q, body, (z, z))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pad_to(x: Array, axis: int, multiple: int) -> Array:
    size = x.shape[axis]
    rem = (-size) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return jnp.pad(x, pad)


def _head_pad(d: int, interpret: bool) -> int:
    # SD head dims (40/80/160) are not lane-aligned. When D is a sublane
    # multiple, hand the unpadded arrays to Mosaic: the implicit lane padding
    # of VMEM loads is zero-filled (verified exact vs the einsum path on
    # hardware; regression-tested in tests/test_flash_attention.py's
    # TPU-gated case), which keeps the QK logits and PV products unchanged
    # while skipping three HBM pad materializations and the output slice.
    # The same argument covers the backward kernels: every dot either
    # contracts over the padded lane dim (zeros contribute nothing) or
    # propagates a zero-padded operand into padded output lanes that the
    # final slice drops. Mosaic does not document the zero-fill, so
    # PNPI_FLASH_EXPLICIT_PAD=1 is the escape hatch if a future jaxlib
    # breaks it. The interpreter (CPU tests) has no such tiling, so pad
    # explicitly there.
    explicit_pad = os.environ.get("PNPI_FLASH_EXPLICIT_PAD") == "1"
    if d % 8 == 0 and not interpret and not explicit_pad:
        return d
    return max(128, ((d + 127) // 128) * 128)


def _flash_forward(q, k, v, scale, block_q, block_k, interpret):
    """Runs the forward kernel; returns (out (B,H,Sq,D), lse (B*H, Sq) f32)
    with out already sliced back to the caller's head dim."""
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(block_q, sq)
    block_k = min(block_k, sk)
    orig_dtype = q.dtype

    d_pad = _head_pad(d, interpret)
    if d != d_pad:
        q = _pad_to(q, 3, d_pad)
        k = _pad_to(k, 3, d_pad)
        v = _pad_to(v, 3, d_pad)

    qf = q.reshape(b * h, sq, d_pad)
    kf = k.reshape(b * h, sk, d_pad)
    vf = v.reshape(b * h, sk, d_pad)

    grid = (b * h, sq // block_q)
    out, lse = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq, d_pad), orig_dtype),
            jax.ShapeDtypeStruct((b * h, 1, sq), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * sq * sk * d_pad,
            bytes_accessed=(qf.size + kf.size + vf.size) * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf)

    return out.reshape(b, h, sq, d_pad)[..., :d], lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash_attention(q, k, v, scale, block_q, block_k, bwd_block_q,
                     bwd_block_k, interpret):
    out, _ = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out


def _flash_fwd_rule(q, k, v, scale, block_q, block_k, bwd_block_q,
                    bwd_block_k, interpret):
    out, lse = _flash_forward(q, k, v, scale, block_q, block_k, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd_rule(scale, block_q, block_k, bwd_block_q, bwd_block_k,
                    interpret, res, do):
    q, k, v, out, lse = res
    b, h, sq, d = q.shape
    sk = k.shape[2]
    block_q = min(bwd_block_q, sq)
    block_k = min(bwd_block_k, sk)
    dtype = q.dtype

    # delta_i = rowsum(dO_i * O_i) — the dP diagonal correction; one fused
    # elementwise pass, f32; (B*H, 1, S) like lse
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1).reshape(b * h, 1, sq)

    d_pad = _head_pad(d, interpret)
    if d != d_pad:
        q = _pad_to(q, 3, d_pad)
        k = _pad_to(k, 3, d_pad)
        v = _pad_to(v, 3, d_pad)
        do = _pad_to(do, 3, d_pad)
    qf = q.reshape(b * h, sq, d_pad)
    kf = k.reshape(b * h, sk, d_pad)
    vf = v.reshape(b * h, sk, d_pad)
    dof = do.astype(dtype).reshape(b * h, sq, d_pad)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, block_k=block_k,
                          seq_k=sk),
        grid=(b * h, sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq, d_pad), dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * sq * sk * d_pad,
            bytes_accessed=(qf.size + kf.size + vf.size + dof.size)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf, dof, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale,
                          block_q=block_q, seq_q=sq),
        grid=(b * h, sk // block_k),
        in_specs=[
            pl.BlockSpec((1, block_k, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq, d_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, sq), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sk, d_pad), dtype),
            jax.ShapeDtypeStruct((b * h, sk, d_pad), dtype),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * b * h * sq * sk * d_pad,
            bytes_accessed=(qf.size + kf.size + vf.size + dof.size)
            * q.dtype.itemsize,
            transcendentals=b * h * sq * sk,
        ),
    )(kf, vf, qf, dof, lse, delta)

    dq = dq.reshape(b, h, sq, d_pad)[..., :d]
    dk = dk.reshape(b, h, sk, d_pad)[..., :d]
    dv = dv.reshape(b, h, sk, d_pad)[..., :d]
    return dq, dk, dv


_flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


@functools.partial(jax.jit, static_argnames=(
    "scale", "block_q", "block_k", "bwd_block_q", "bwd_block_k", "interpret"))
def flash_attention(q: Array, k: Array, v: Array, scale: float,
                    block_q: int | None = None,
                    block_k: int | None = None,
                    bwd_block_q: int | None = None,
                    bwd_block_k: int | None = None,
                    interpret: bool = False) -> Array:
    """q,k,v: (B, H, S, D) -> (B, H, S, D). Non-causal softmax attention.

    block_q/block_k default to the per-shape v5e-tuned table
    (``_default_blocks``); bwd_block_* tile the two backward kernels and
    default to ``_default_bwd_blocks``. Pass any explicitly to override
    (tuning runs).

    Differentiable: reverse-mode goes through the Pallas FlashAttention-2
    backward kernels above (null-text / pix2pix-zero grad-through-UNet)."""
    dq, dk = _default_blocks(q.shape[2], k.shape[2])
    bdq, bdk = _default_bwd_blocks(q.shape[2], k.shape[2])
    return _flash_attention(q, k, v, scale,
                            block_q if block_q is not None else dq,
                            block_k if block_k is not None else dk,
                            bwd_block_q if bwd_block_q is not None else bdq,
                            bwd_block_k if bwd_block_k is not None else bdk,
                            interpret)
