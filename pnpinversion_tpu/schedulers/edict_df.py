"""Double-float (two-float32) emulation of EDICT's float64 latent algebra.

The reference casts the whole EDICT pipeline to float64 for exact
invertibility (/root/reference/models/edict/edict_functions.py:50-52). TPUs
have no fast f64; instead the coupled-latent carry is represented as an
unevaluated (hi, lo) float32 pair — "double-float" arithmetic with error-free
transforms (Knuth two-sum, Veltkamp split / Dekker two-product) — giving
~49 bits of mantissa for the step/mix/unmix algebra while the UNet itself
still runs in float32 (its output precision, not the latent algebra, then
sets the error floor).

Every affine EDICT update is a scale-and-add ``x' = A*x + C*eps`` whose
coefficients are computed on host in true float64 from the f64 beta schedule
(mirroring edict_functions.py:599-684) and split into (hi, lo) pairs.

NOTE on XLA: these transforms rely on strict IEEE f32 semantics. XLA does not
reassociate floating-point by default, so the algebra survives jit; do not
wrap these in fast-math-style custom kernels.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array

_SPLIT = 4097.0  # 2**12 + 1 splits a 24-bit f32 mantissa into two 12-bit halves


def _two_sum(a: Array, b: Array) -> Tuple[Array, Array]:
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _quick_two_sum(a: Array, b: Array) -> Tuple[Array, Array]:
    """Requires |a| >= |b| (true after a dominant-term sum)."""
    s = a + b
    return s, b - (s - a)


def _split(a: Array) -> Tuple[Array, Array]:
    t = _SPLIT * a
    hi = t - (t - a)
    return hi, a - hi


def _two_prod(a: Array, b: Array) -> Tuple[Array, Array]:
    p = a * b
    ah, al = _split(a)
    bh, bl = _split(b)
    err = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, err


class DF(NamedTuple):
    """A double-float array: value = hi + lo, |lo| <= ulp(hi)/2."""

    hi: Array
    lo: Array


def df_from(x: Array) -> DF:
    return DF(x.astype(jnp.float32), jnp.zeros_like(x, jnp.float32))


def df_to_f32(x: DF) -> Array:
    return x.hi + x.lo


def df_add(x: DF, y: DF) -> DF:
    s, e = _two_sum(x.hi, y.hi)
    e = e + (x.lo + y.lo)
    return DF(*_quick_two_sum(s, e))


def df_scale(x: DF, c_hi: Array, c_lo: Array) -> DF:
    """x * c where c is a double-float scalar (c_hi, c_lo)."""
    p, e = _two_prod(x.hi, c_hi)
    e = e + (x.hi * c_lo + x.lo * c_hi)
    return DF(*_quick_two_sum(p, e))


def f32_scale(x: Array, c_hi: Array, c_lo: Array) -> DF:
    """Plain-f32 array times a double-float scalar -> double-float."""
    p, e = _two_prod(x, c_hi)
    e = e + x * c_lo
    return DF(*_quick_two_sum(p, e))


def split_scalar(c: float) -> Tuple[np.float32, np.float32]:
    hi = np.float32(c)
    return hi, np.float32(np.float64(c) - np.float64(hi))


def split_array(c: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    hi = c.astype(np.float32)
    return hi, (c - hi.astype(np.float64)).astype(np.float32)


# ----------------------------------------------------------- EDICT algebra


def _alphas_cumprod_f64(num_train_timesteps: int = 1000,
                        beta_start: float = 0.00085,
                        beta_end: float = 0.012) -> np.ndarray:
    betas = np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps,
                        dtype=np.float64) ** 2
    return np.cumprod(1.0 - betas)


def edict_df_coeffs(num_steps: int, t_limit: int, reverse: bool,
                    num_train_timesteps: int = 1000):
    """Per-scan-step (A_hi, A_lo, C_hi, C_lo) for x' = A*x + C*eps, computed
    in true float64 on host (mirrors edict_functions.py:599-684).

    forward (generation): A = 1/q, C = -sqrt(beta_t)/q + sqrt(1-a_prev)
    reverse (inversion):  A = q,   C =  sqrt(beta_t)   - q*sqrt(1-a_prev)
    with q = sqrt(a_t / a_prev); a_prev at t - step_ratio (final alpha for
    t < 0, set_alpha_to_one=False semantics).
    """
    ac = _alphas_cumprod_f64(num_train_timesteps)
    final_alpha = ac[0]
    step_ratio = num_train_timesteps // num_steps
    ts = (np.arange(0, num_steps) * step_ratio).round()[::-1].astype(np.int64)
    ts = ts[t_limit:]
    if reverse:
        ts = ts[::-1]

    def alpha_at(t):
        return ac[t] if t >= 0 else final_alpha

    A = np.empty(len(ts), np.float64)
    C = np.empty(len(ts), np.float64)
    for i, t in enumerate(ts):
        a_t = alpha_at(t)
        a_prev = alpha_at(t - step_ratio)
        beta_t = 1.0 - a_t
        q = np.sqrt(a_t / a_prev)
        if reverse:
            A[i] = q
            C[i] = np.sqrt(beta_t) - q * np.sqrt(1.0 - a_prev)
        else:
            A[i] = 1.0 / q
            C[i] = -np.sqrt(beta_t) / q + np.sqrt(1.0 - a_prev)
    return (*split_array(A), *split_array(C))


def edict_step_df(x: DF, eps: Array, a_hi, a_lo, c_hi, c_lo) -> DF:
    """x' = A*x + C*eps with double-float x and f32 eps."""
    return df_add(df_scale(x, a_hi, a_lo), f32_scale(eps, c_hi, c_lo))


_MIX_CONSTS = {}


def _mix_consts(p: float):
    if p not in _MIX_CONSTS:
        _MIX_CONSTS[p] = {
            "p": split_scalar(p),
            "omp": split_scalar(1.0 - np.float64(p)),
            "invp": split_scalar(1.0 / np.float64(p)),
            "nompp": split_scalar(-(1.0 - np.float64(p)) / np.float64(p)),
        }
    return _MIX_CONSTS[p]


def edict_mix_df(x0: DF, x1: DF, mix_weight: float) -> Tuple[DF, DF]:
    """Generation-direction contraction (edict_functions.py:931-936)."""
    c = _mix_consts(mix_weight)
    y0 = df_add(df_scale(x0, *c["p"]), df_scale(x1, *c["omp"]))
    y1 = df_add(df_scale(y0, *c["omp"]), df_scale(x1, *c["p"]))
    return y0, y1


def edict_unmix_df(x0: DF, x1: DF, mix_weight: float) -> Tuple[DF, DF]:
    """Exact inverse of edict_mix_df (edict_functions.py:854-859)."""
    c = _mix_consts(mix_weight)
    y1 = df_add(df_scale(x1, *c["invp"]), df_scale(x0, *c["nompp"]))
    y0 = df_add(df_scale(x0, *c["invp"]), df_scale(y1, *c["nompp"]))
    return y0, y1
