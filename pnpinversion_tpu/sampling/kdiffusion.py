"""k-diffusion-style sigma-space sampling (Euler-ancestral) for the
instruction-editing models.

Parity: k_diffusion.external.CompVisDenoiser + sampling.sample_euler_ancestral
as driven by /root/reference/run_editing_instructpix2pix.py:33-46,100-125 and
run_editing_instructdiffusion.py:32-49. Sigma grid: log-interpolated over the
1000-step sqrt((1-acp)/acp) table; denoised = x - sigma * eps(x / sqrt(1+sigma^2), t(sigma)).
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pnpinversion_tpu.schedulers.ddim import DDIMSchedule

Array = jax.Array


def sigma_table(schedule: DDIMSchedule) -> Array:
    acp = schedule.alphas_cumprod
    return ((1.0 - acp) / acp) ** 0.5


def get_sigmas(schedule: DDIMSchedule, n: int) -> Array:
    """n+1 descending sigmas with a 0 appended (DiscreteSchedule.get_sigmas)."""
    sig = sigma_table(schedule)
    log_sig = jnp.log(sig)
    t = jnp.linspace(0.0, schedule.num_train_timesteps - 1, n)
    low = jnp.floor(t).astype(jnp.int32)
    high = jnp.ceil(t).astype(jnp.int32)
    w = t - low
    ls = (1 - w) * log_sig[low] + w * log_sig[high]
    sigmas = jnp.exp(ls)[::-1]
    return jnp.concatenate([sigmas, jnp.zeros((1,), sigmas.dtype)])


def sigma_to_t(schedule: DDIMSchedule, sigma: Array) -> Array:
    """Continuous timestep via log-sigma interpolation (CompVisDenoiser)."""
    log_sig = jnp.log(sigma_table(schedule))
    ls = jnp.log(sigma)
    dists = ls - log_sig
    low_idx = jnp.clip(jnp.sum(dists >= 0) - 1, 0, log_sig.shape[0] - 2)
    high_idx = low_idx + 1
    low, high = log_sig[low_idx], log_sig[high_idx]
    w = jnp.clip((low - ls) / (low - high), 0.0, 1.0)
    return (1 - w) * low_idx + w * high_idx


def get_ancestral_step(sigma_from: Array, sigma_to: Array) -> Tuple[Array, Array]:
    sigma_up = jnp.minimum(
        sigma_to,
        (sigma_to**2 * (sigma_from**2 - sigma_to**2) / sigma_from**2) ** 0.5,
    )
    sigma_down = (sigma_to**2 - sigma_up**2) ** 0.5
    return sigma_down, sigma_up


def sample_euler_ancestral(
    denoise_fn: Callable[[Array, Array], Array],  # (x, sigma) -> denoised x0
    x: Array,
    sigmas: Array,  # (n+1,)
    rng: Array,
) -> Array:
    n = sigmas.shape[0] - 1

    def body(carry, i):
        x, key = carry
        key, kn = jax.random.split(key)
        sigma = sigmas[i]
        denoised = denoise_fn(x, sigma)
        sigma_down, sigma_up = get_ancestral_step(sigma, sigmas[i + 1])
        d = (x - denoised) / sigma
        x = x + d * (sigma_down - sigma)
        noise = jax.random.normal(kn, x.shape, x.dtype)
        x = x + noise * jnp.where(sigmas[i + 1] > 0, sigma_up, 0.0)
        return (x, key), ()

    (x, _), _ = jax.lax.scan(body, (x, rng), jnp.arange(n))
    return x
