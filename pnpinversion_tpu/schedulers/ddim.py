"""DDIM scheduler math as pure functions over precomputed alpha tables.

Semantics match the reference stack:
- beta schedule / timestep grid: diffusers DDIMScheduler as configured by
  `/root/reference/models/p2p_editor.py:18-25` (scaled_linear 0.00085->0.012,
  1000 train steps, clip_sample=False, set_alpha_to_one=False).
- denoising step (`ddim_step`): `/root/reference/models/p2p/inversion.py:247-260`
  ("prev_step") and the recon-guided variant
  `/root/reference/models/p2p/scheduler_dev.py:10-121`.
- inversion step (`ddim_inverse_step`): `/root/reference/models/p2p/inversion.py:262-270`
  ("next_step").

Everything here is trace-friendly: timesteps are int32 arrays indexed inside
`lax.scan`, boundary conditions are `jnp.where` on the index rather than
Python branches, so a single compiled step serves every position in the
trajectory.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Precomputed tables for a DDIM trajectory.

    Attributes:
      alphas_cumprod: (num_train_timesteps,) float32 cumulative alpha products.
      final_alpha_cumprod: scalar used when the previous timestep is < 0
        (``set_alpha_to_one=False`` => alphas_cumprod[0]).
      timesteps: (num_steps,) int32 descending denoising timesteps, e.g.
        [980, 960, ..., 0] for 50 steps.
      num_train_timesteps / num_steps: static ints.
    """

    alphas_cumprod: Array
    final_alpha_cumprod: Array
    timesteps: Array
    num_train_timesteps: int
    num_steps: int

    def tree_flatten(self):
        return (
            (self.alphas_cumprod, self.final_alpha_cumprod, self.timesteps),
            (self.num_train_timesteps, self.num_steps),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def step_ratio(self) -> int:
        return self.num_train_timesteps // self.num_steps

    def alpha_at(self, t: Array) -> Array:
        """alphas_cumprod[t], with t < 0 mapping to final_alpha_cumprod."""
        safe_t = jnp.clip(t, 0, self.num_train_timesteps - 1)
        return jnp.where(t >= 0, self.alphas_cumprod[safe_t], self.final_alpha_cumprod)


def make_betas(
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
) -> np.ndarray:
    if beta_schedule == "scaled_linear":
        betas = (
            np.linspace(beta_start**0.5, beta_end**0.5, num_train_timesteps, dtype=np.float64) ** 2
        )
    elif beta_schedule == "linear":
        betas = np.linspace(beta_start, beta_end, num_train_timesteps, dtype=np.float64)
    else:
        raise ValueError(f"unknown beta schedule {beta_schedule!r}")
    return betas.astype(np.float32)


def make_ddim_schedule(
    num_steps: int = 50,
    num_train_timesteps: int = 1000,
    beta_start: float = 0.00085,
    beta_end: float = 0.012,
    beta_schedule: str = "scaled_linear",
    set_alpha_to_one: bool = False,
    steps_offset: int = 0,
    dtype=jnp.float32,
) -> DDIMSchedule:
    betas = make_betas(num_train_timesteps, beta_start, beta_end, beta_schedule)
    alphas_cumprod = np.cumprod(1.0 - betas.astype(np.float64)).astype(np.float32)
    final_alpha = np.float32(1.0) if set_alpha_to_one else alphas_cumprod[0]
    step_ratio = num_train_timesteps // num_steps
    timesteps = (np.arange(0, num_steps) * step_ratio).round()[::-1].astype(np.int64)
    timesteps = timesteps + steps_offset
    return DDIMSchedule(
        alphas_cumprod=jnp.asarray(alphas_cumprod, dtype=dtype),
        final_alpha_cumprod=jnp.asarray(final_alpha, dtype=dtype),
        timesteps=jnp.asarray(timesteps, dtype=jnp.int32),
        num_train_timesteps=num_train_timesteps,
        num_steps=num_steps,
    )


def _broadcast(scalar: Array, like: Array) -> Array:
    return jnp.reshape(scalar, (1,) * like.ndim).astype(like.dtype)


def pred_x0_from_eps(sample: Array, eps: Array, alpha_prod_t: Array) -> Array:
    beta_prod_t = 1.0 - alpha_prod_t
    return (sample - _broadcast(beta_prod_t**0.5, sample) * eps) / _broadcast(
        alpha_prod_t**0.5, sample
    )


def ddim_step(
    schedule: DDIMSchedule,
    eps: Array,
    t: Array,
    sample: Array,
) -> Array:
    """x_t -> x_{t-Δ} (deterministic DDIM, eta=0, epsilon prediction).

    Matches reference `prev_step` (models/p2p/inversion.py:247-254) and
    `DDIMSchedulerDev.step` with default kwargs (models/p2p/scheduler_dev.py:38-94).
    """
    prev_t = t - schedule.step_ratio
    alpha_prod_t = schedule.alpha_at(t)
    alpha_prod_t_prev = schedule.alpha_at(prev_t)
    pred_x0 = pred_x0_from_eps(sample, eps, alpha_prod_t)
    direction = _broadcast((1.0 - alpha_prod_t_prev) ** 0.5, sample) * eps
    return _broadcast(alpha_prod_t_prev**0.5, sample) * pred_x0 + direction


def ddim_step_with_scale(
    schedule: DDIMSchedule,
    eps: Array,
    t: Array,
    sample: Array,
) -> Tuple[Array, Array]:
    """DDIM step plus the analytic difference scale used by DirectInversion.

    Reference: models/p2p/inversion.py:247-260 — ``difference_scale`` is
    d(prev_sample)/d(model_output), returned so callers can rescale offsets.
    """
    prev_t = t - schedule.step_ratio
    alpha_prod_t = schedule.alpha_at(t)
    alpha_prod_t_prev = schedule.alpha_at(prev_t)
    prev_sample = ddim_step(schedule, eps, t, sample)
    diff_scale = (
        alpha_prod_t_prev**0.5 * (-((1.0 - alpha_prod_t) ** 0.5)) / alpha_prod_t**0.5
        + (1.0 - alpha_prod_t_prev) ** 0.5
    )
    return prev_sample, diff_scale


def ddim_inverse_step(
    schedule: DDIMSchedule,
    eps: Array,
    t: Array,
    sample: Array,
) -> Array:
    """x_t -> x_{t+Δ} (DDIM inversion 'next_step').

    Matches models/p2p/inversion.py:262-270: the 'current' alpha is taken at
    ``min(t - Δ, 999)`` (i.e. the previous grid point), with t-Δ < 0 mapping to
    final_alpha_cumprod, and the 'next' alpha at ``t``.
    """
    cur_t = jnp.minimum(t - schedule.step_ratio, schedule.num_train_timesteps - 1)
    alpha_prod_t = schedule.alpha_at(cur_t)
    alpha_prod_t_next = schedule.alpha_at(t)
    x0 = pred_x0_from_eps(sample, eps, alpha_prod_t)
    direction = _broadcast((1.0 - alpha_prod_t_next) ** 0.5, sample) * eps
    return _broadcast(alpha_prod_t_next**0.5, sample) * x0 + direction


def ddim_variance(schedule: DDIMSchedule, t: Array) -> Array:
    """sigma_t^2 for eta>0 steps (diffusers DDIMScheduler._get_variance)."""
    prev_t = t - schedule.step_ratio
    alpha_prod_t = schedule.alpha_at(t)
    alpha_prod_t_prev = schedule.alpha_at(prev_t)
    beta_prod_t = 1.0 - alpha_prod_t
    beta_prod_t_prev = 1.0 - alpha_prod_t_prev
    return (beta_prod_t_prev / beta_prod_t) * (1.0 - alpha_prod_t / alpha_prod_t_prev)


def ddim_step_recon_guided(
    schedule: DDIMSchedule,
    eps: Array,
    t: Array,
    sample: Array,
    ref_image: Optional[Array] = None,
    recon_lr: float = 0.0,
    recon_mask: Optional[Array] = None,
    eta: float = 0.0,
    variance_noise: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """DDIMSchedulerDev.step semantics (models/p2p/scheduler_dev.py:10-121).

    Pulls pred_x0 toward ``ref_image`` (optionally masked) before taking the
    step — the hook proximal guidance uses for background reconstruction.
    Returns (prev_sample, pred_x0_after_guidance).
    """
    prev_t = t - schedule.step_ratio
    alpha_prod_t = schedule.alpha_at(t)
    alpha_prod_t_prev = schedule.alpha_at(prev_t)
    pred_x0 = pred_x0_from_eps(sample, eps, alpha_prod_t)

    if ref_image is not None and recon_lr > 0.0:
        ref = jnp.broadcast_to(ref_image, pred_x0.shape).astype(pred_x0.dtype)
        if recon_mask is not None:
            mask = jnp.broadcast_to(recon_mask, pred_x0.shape).astype(pred_x0.dtype)
            pred_x0 = pred_x0 - recon_lr * (pred_x0 - ref) * mask
        else:
            pred_x0 = pred_x0 - recon_lr * (pred_x0 - ref)

    if eta > 0.0:
        std_dev_t = eta * ddim_variance(schedule, t) ** 0.5
    else:
        std_dev_t = jnp.zeros((), dtype=sample.dtype)
    direction = _broadcast((1.0 - alpha_prod_t_prev - std_dev_t**2) ** 0.5, sample) * eps
    prev_sample = _broadcast(alpha_prod_t_prev**0.5, sample) * pred_x0 + direction
    if eta > 0.0 and variance_noise is not None:
        prev_sample = prev_sample + _broadcast(std_dev_t, sample) * variance_noise
    return prev_sample, pred_x0


def add_noise(schedule: DDIMSchedule, x0: Array, noise: Array, t: Array) -> Array:
    """Forward diffusion q(x_t | x_0) sample (diffusers add_noise)."""
    alpha_prod_t = schedule.alpha_at(t)
    return (
        _broadcast(alpha_prod_t**0.5, x0) * x0
        + _broadcast((1.0 - alpha_prod_t) ** 0.5, x0) * noise
    )


def classifier_free_guidance(eps_uncond: Array, eps_cond: Array, scale: Array) -> Array:
    return eps_uncond + scale * (eps_cond - eps_uncond)
