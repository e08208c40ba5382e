"""Edit-friendly DDPM inversion (noise-map extraction) as scans.

Parity target: /root/reference/models/edit_friendly_ddm/inversion_utils.py —
``sample_xts_from_x0`` (:31-55), ``inversion_forward_process`` (:100-176, the
eta>0 branch that solves for the variance noise z), ``reverse_step`` /
``inversion_reverse_process`` (:179-262) which re-inject the stored noise
maps. The runner's configuration (run_editing_edit_friendly_p2p.py:60-99):
eta=1, skip=12, source cfg 1, target cfg 7.5, SD1.4 with steps_offset=1.
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from pnpinversion_tpu.configs import UNetConfig
from pnpinversion_tpu.control.base import BaseControl, NO_CONTROL
from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.schedulers.ddim import (
    DDIMSchedule,
    classifier_free_guidance,
    ddim_variance,
)

Array = jax.Array


def sample_xts_from_x0(rng: Array, schedule: DDIMSchedule, x0: Array) -> Array:
    """Independent (non-chained) noising trajectory: xts[k] ~ q(x_t | x0) for
    t = timesteps[T-k], xts[0] = x0. Returns (T+1, *x0.shape)."""
    T = schedule.num_steps
    ts = schedule.timesteps[::-1]  # ascending
    alpha = schedule.alphas_cumprod[ts]  # (T,)
    noise = jax.random.normal(rng, (T,) + x0.shape, x0.dtype)
    shape = (T,) + (1,) * x0.ndim
    xts = x0[None] * (alpha.reshape(shape) ** 0.5) + noise * (
        (1.0 - alpha.reshape(shape)) ** 0.5
    )
    return jnp.concatenate([x0[None], xts], axis=0)


def ef_forward_process(
    params,
    schedule: DDIMSchedule,
    x0: Array,  # (1, h, w, c)
    cond_embedding: Array,  # (1, 77, D) source prompt
    uncond_embedding: Array,  # (1, 77, D)
    cfg_scale: Array,
    config: UNetConfig,
    rng: Array,
    eta: float = 1.0,
    xts0: Optional[Array] = None,
) -> Tuple[Array, Array]:
    """Extract per-step noise maps. Returns (zs (T, 1, h, w, c),
    xts (T+1, 1, h, w, c) corrected trajectory)."""
    T = schedule.num_steps
    if xts0 is None:
        xts0 = sample_xts_from_x0(rng, schedule, x0)
    ctx = jnp.concatenate([uncond_embedding, cond_embedding], axis=0)

    def body(xt, i):
        # xt is the re-chained x_t from the previous iteration (the reference
        # mutates xts in place and reads xts[idx+1], :137,171)
        t = schedule.timesteps[i]
        idx = T - 1 - i
        eps2, _ = unet_apply(params, jnp.concatenate([xt, xt], axis=0), t, ctx, config)
        eps = classifier_free_guidance(eps2[:1], eps2[1:], cfg_scale)
        alpha_t = schedule.alpha_at(t)
        x0_pred = (xt - (1.0 - alpha_t) ** 0.5 * eps) / alpha_t**0.5
        alpha_prev = schedule.alpha_at(t - schedule.step_ratio)
        var = ddim_variance(schedule, t)
        mu = alpha_prev**0.5 * x0_pred + (1.0 - alpha_prev - eta * var) ** 0.5 * eps
        xtm1_s = xts0[idx]
        z = (xtm1_s - mu) / (eta * var**0.5)
        xtm1 = mu + eta * var**0.5 * z  # re-chain (:170-171)
        return xtm1, (z, xtm1)

    _, (zs_rev, xts_rev) = jax.lax.scan(body, xts0[T], jnp.arange(T))
    zs = zs_rev[::-1]
    zs = zs.at[0].set(jnp.zeros_like(zs[0]))  # (:174)
    # indices 0..T-1 are the re-chained xtm1 values (the reference overwrites
    # xts[idx] in place, :171); index T keeps the sampled endpoint
    xts = jnp.concatenate([xts_rev[::-1], xts0[-1:]], axis=0)
    return zs, xts


def ef_reverse_process(
    params,
    schedule: DDIMSchedule,
    xT: Array,  # (1, h, w, c) start latent (xts[T - skip])
    zs: Array,  # (Z, 1, h, w, c) with Z = T - skip
    cond_embeddings: Array,  # (B, 77, D)
    uncond_embeddings: Array,  # (B, 77, D)
    cfg_scales: Array,  # (B,) per-row guidance
    config: UNetConfig,
    eta: float = 1.0,
    control: BaseControl = NO_CONTROL,
    tensors: Optional[Dict[str, Array]] = None,
    num_zs: Optional[int] = None,
) -> Array:
    """DDPM-like sampling injecting the stored noise maps (:224-262).
    Step k uses t = timesteps[T - Z + k] and z index Z-1-k."""
    T = schedule.num_steps
    Z = num_zs if num_zs is not None else zs.shape[0]
    B = cond_embeddings.shape[0]
    ctx = jnp.concatenate([uncond_embeddings, cond_embeddings], axis=0)
    latents0 = jnp.broadcast_to(xT, (B,) + xT.shape[1:])
    state0 = control.init_state(B, xT.dtype, heads=config.num_heads)
    scales = cfg_scales.reshape(B, 1, 1, 1)

    def body(carry, k):
        latents, state = carry
        t = schedule.timesteps[T - Z + k]
        idx = Z - 1 - k
        x_in = jnp.concatenate([latents, latents], axis=0)
        eps2, state = unet_apply(params, x_in, t, ctx, config, control, tensors, state, step=k)
        eps = eps2[:B] + scales * (eps2[B:] - eps2[:B])
        alpha_t = schedule.alpha_at(t)
        x0_pred = (latents - (1.0 - alpha_t) ** 0.5 * eps) / alpha_t**0.5
        alpha_prev = schedule.alpha_at(t - schedule.step_ratio)
        var = ddim_variance(schedule, t)
        prev = alpha_prev**0.5 * x0_pred + (1.0 - alpha_prev - eta * var) ** 0.5 * eps
        z = jnp.broadcast_to(zs[idx], prev.shape)
        prev = prev + eta * var**0.5 * z
        prev, state = control.step_callback(prev, tensors, state, k)
        return (prev, state), ()

    (latents, _), _ = jax.lax.scan(body, (latents0, state0), jnp.arange(Z))
    return latents
