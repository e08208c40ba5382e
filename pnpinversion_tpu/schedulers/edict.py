"""EDICT exact affine DDIM steps + coupled mixing layers.

Parity: /root/reference/models/edict/edict_functions.py:599-684 (forward /
reverse steps with linear-interp alphas) and the mixing/unmixing layers
(:854-859, :931-936). The reference casts everything to float64 for exact
invertibility; on TPU we default to float32 (the affine algebra is exactly
invertible in any precision up to rounding) and expose dtype for CPU f64 runs.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from pnpinversion_tpu.schedulers.ddim import DDIMSchedule

Array = jax.Array


def edict_forward_step(schedule: DDIMSchedule, eps: Array, t: Array, sample: Array) -> Array:
    """Generation-direction step x_t -> x_{t-Δ} in quotient form (:621-650)."""
    alpha_t = schedule.alpha_at(t)
    alpha_prev = schedule.alpha_at(t - schedule.step_ratio)
    beta_t = 1.0 - alpha_t
    q = (alpha_t / alpha_prev) ** 0.5
    first = sample / q
    second = (beta_t**0.5) * eps / q
    third = ((1.0 - alpha_prev) ** 0.5) * eps
    return first - second + third


def edict_reverse_step(schedule: DDIMSchedule, eps: Array, t: Array, sample: Array) -> Array:
    """Exact inverse of edict_forward_step (:652-684)."""
    alpha_t = schedule.alpha_at(t)
    alpha_prev = schedule.alpha_at(t - schedule.step_ratio)
    beta_t = 1.0 - alpha_t
    q = (alpha_t / alpha_prev) ** 0.5
    return q * sample + (beta_t**0.5) * eps - q * ((1.0 - alpha_prev) ** 0.5) * eps


def edict_mix(pair: Array, mix_weight: float) -> Array:
    """Generation-direction contraction (:931-936). pair: (2, ...)."""
    p = mix_weight
    x0 = p * pair[0] + (1.0 - p) * pair[1]
    x1 = (1.0 - p) * x0 + p * pair[1]
    return jnp.stack([x0, x1], axis=0)


def edict_unmix(pair: Array, mix_weight: float) -> Array:
    """Exact inverse of edict_mix, applied before inversion steps (:854-859)."""
    p = mix_weight
    x1 = (pair[1] - (1.0 - p) * pair[0]) / p
    x0 = (pair[0] - (1.0 - p) * x1) / p
    return jnp.stack([x0, x1], axis=0)
