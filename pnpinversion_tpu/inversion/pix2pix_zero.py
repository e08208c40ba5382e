"""pix2pix-zero inversion with noise regularization + the cross-attention
guided editing loop.

Parity targets:
- DDIMInversion.__call__ (/root/reference/models/pix2pix_zero/ddim_inv.py:46-150):
  per step, 5 outer regularization rounds of {5 autocorrelation-gradient
  descents + 1 KL-gradient descent} applied to the noise prediction, then an
  inverse-DDIM step.
- DDIMInverseScheduler.step (/root/reference/models/pix2pix_zero/scheduler.py:210-244):
  walks t upward with alphas indexed at t-1 and the end clamp to the last
  train step.
- EditingPipeline.__call__ (/root/reference/models/pix2pix_zero/edit_pipeline.py:60-188):
  pass 1 reconstructs while caching every cross-attn map; pass 2 adds
  edit_dir to the cond embedding and per step takes ONE SGD step on the
  latent to pull the current maps toward the reference maps.

TPU redesign: the reference offloads ~6.6GB of reference maps to CPU; here
the two passes run in ONE scan whose body recomputes the reference maps for
the current step in-batch, so the map storage is transient (per-step) and
everything stays on device.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pnpinversion_tpu.configs import UNetConfig
from pnpinversion_tpu.control.attn_store import CrossAttnStoreControl
from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.schedulers.ddim import (
    DDIMSchedule,
    classifier_free_guidance,
    ddim_step,
)

Array = jax.Array


# ---------------------------------------------------------------------------
# regularization losses (ddim_inv.py:23-44)
# ---------------------------------------------------------------------------

def auto_corr_loss(x: Array, shifts: Array) -> Array:
    """Pyramid autocorrelation loss. x: (1, H, W, C) NHWC; shifts: (levels,)
    int32 roll amounts (one per pyramid level, used for both axes)."""
    _, h, w, c = x.shape
    levels = 1
    size = h
    while size > 8:
        size //= 2
        levels += 1
    loss = jnp.zeros((), jnp.float32)
    noise = x.transpose(0, 3, 1, 2).reshape(c, 1, h, w)  # per-channel maps
    for lvl in range(levels):
        roll = shifts[lvl]
        rolled_h = jnp.roll(noise, roll, axis=2)
        rolled_w = jnp.roll(noise, roll, axis=3)
        # reference accumulates mean()**2 per channel (ddim_inv.py:29-38)
        loss = loss + jnp.sum(jnp.mean(noise * rolled_h, axis=(1, 2, 3)) ** 2)
        loss = loss + jnp.sum(jnp.mean(noise * rolled_w, axis=(1, 2, 3)) ** 2)
        if noise.shape[2] > 8:
            noise = jax.lax.reduce_window(
                noise, 0.0, jax.lax.add, (1, 1, 2, 2), (1, 1, 2, 2), "VALID") / 4.0
    return loss


def kl_divergence(x: Array) -> Array:
    mu = jnp.mean(x)
    var = jnp.var(x)
    return var + mu**2 - 1.0 - jnp.log(var + 1e-7)


def regularize_noise(eps: Array, rng: Array, lambda_ac: float = 20.0,
                     lambda_kl: float = 20.0, num_reg_steps: int = 5,
                     num_ac_rolls: int = 5) -> Array:
    """ddim_inv.py:118-133, traced with jax.grad over the closed-form losses."""
    h = eps.shape[1]
    levels = 1
    size = h
    while size > 8:
        size //= 2
        levels += 1

    def one_round(e, key):
        def ac_once(e, k):
            shifts = jax.vmap(
                lambda kk, m: jax.random.randint(kk, (), 0, m)
            )(jax.random.split(k, levels),
              jnp.array([max(1, (h >> i) // 2) for i in range(levels)]))
            g = jax.grad(lambda z: auto_corr_loss(z, shifts))(e)
            return e - lambda_ac * g / num_ac_rolls, None

        keys = jax.random.split(key, num_ac_rolls)
        e, _ = jax.lax.scan(ac_once, e, keys)
        g = jax.grad(kl_divergence)(e)
        return e - lambda_kl * g, None

    keys = jax.random.split(rng, num_reg_steps)
    eps, _ = jax.lax.scan(one_round, eps, keys)
    return eps


# ---------------------------------------------------------------------------
# inverse scheduler step (scheduler.py:210-244)
# ---------------------------------------------------------------------------

def p2z_inverse_step(schedule: DDIMSchedule, eps: Array, t: Array, sample: Array) -> Array:
    a_t = schedule.alphas_cumprod[jnp.clip(t - 1, 0, schedule.num_train_timesteps - 1)]
    prev_t = t + schedule.step_ratio
    a_prev = jnp.where(
        prev_t <= schedule.num_train_timesteps,
        schedule.alphas_cumprod[
            jnp.clip(prev_t - 1, 0, schedule.num_train_timesteps - 1)],
        schedule.alphas_cumprod[-1],
    )
    x0 = (sample - (1.0 - a_t) ** 0.5 * eps) / a_t**0.5
    return a_prev**0.5 * x0 + (1.0 - a_prev) ** 0.5 * eps


def p2z_invert(
    params,
    schedule: DDIMSchedule,  # steps_offset=1 schedule
    latent: Array,  # (1, h, w, c) VAE-encoded (posterior sample) latent
    cond_embedding: Array,  # (1, 77, D) caption embedding
    config: UNetConfig,
    rng: Array,
    lambda_ac: float = 20.0,
    lambda_kl: float = 20.0,
    num_reg_steps: int = 5,
    num_ac_rolls: int = 5,
) -> Array:
    """Returns the full (T+1, 1, h, w, c) inversion trajectory."""
    T = schedule.num_steps
    ts = schedule.timesteps[::-1]  # ascending [1, 21, ..., 981]

    def body(carry, i):
        lat, key = carry
        key, sub = jax.random.split(key)
        t = ts[i]
        eps, _ = unet_apply(params, lat, t, cond_embedding, config)
        eps = regularize_noise(eps, sub, lambda_ac, lambda_kl,
                               num_reg_steps, num_ac_rolls)
        # the inverse step runs in f32 (raw schedule scalars); cast the
        # carry back so bf16 production pipelines keep a stable scan carry
        lat = p2z_inverse_step(schedule, eps, t, lat).astype(latent.dtype)
        return (lat, key), lat

    (_, _), traj = jax.lax.scan(body, (latent, rng), jnp.arange(T))
    return jnp.concatenate([latent[None], traj], axis=0)


# ---------------------------------------------------------------------------
# fused recon+edit loop (edit_pipeline.py:86-188)
# ---------------------------------------------------------------------------

def p2z_edit(
    params,
    schedule: DDIMSchedule,  # steps_offset=1 denoising schedule
    x_inv: Array,  # (1, h, w, c) inversion endpoint
    prompt_embeds: Array,  # (2, 77, D): [negative(=caption), caption]
    edit_dir: Array,  # (1, 77, D) added to the cond row in pass 2
    guidance_scale: Array,
    guidance_amount: float,
    config: UNetConfig,
    latent_list: Optional[Array] = None,  # (T+1, 1, h, w, c) for directinversion
) -> Tuple[Array, Array]:
    """Returns (recon_latents, edit_latents), each (1, h, w, c)."""
    T = schedule.num_steps
    store = CrossAttnStoreControl()
    use_offsets = latent_list is not None
    prompt_embeds_edit = prompt_embeds.at[1:2].add(edit_dir)

    def maps_of(state):
        return {k: v for k, v in state.items() if k.startswith("xattn_")}

    def map_loss(curr, ref):
        total = jnp.zeros((), jnp.float32)
        for k in ref:
            d = (curr[k].astype(jnp.float32) - ref[k].astype(jnp.float32)) ** 2
            # ((curr-ref)**2).sum((1,2)).mean(0) over (B*H, s, 77)
            total = total + d.sum(axis=(2, 3)).mean()
        return total

    def body(carry, i):
        rec, edit = carry
        t = schedule.timesteps[i]

        # --- pass-1 replay: recon step + reference maps
        x2 = jnp.concatenate([rec, rec], axis=0)
        eps2, st = unet_apply(params, x2, t, prompt_embeds, config, store, {}, {}, step=i)
        ref_maps = jax.tree.map(jax.lax.stop_gradient, maps_of(st))
        eps = classifier_free_guidance(eps2[:1], eps2[1:], guidance_scale)
        rec_new = ddim_step(schedule, eps, t, rec)
        if use_offsets:
            noise_loss = latent_list[T - 1 - i] - rec_new  # latent_list[-2-i]
            rec_new = rec_new + noise_loss
        else:
            noise_loss = jnp.zeros_like(rec_new)

        # --- pass-2: one SGD step on the latent toward the reference maps
        x_in = jnp.concatenate([edit, edit], axis=0)

        def loss_fn(x):
            _, st2 = unet_apply(params, x, t, prompt_embeds_edit, config,
                                store, {}, {}, step=i)
            return map_loss(maps_of(st2), ref_maps)

        gx = jax.grad(loss_fn)(x_in)
        x_in = x_in - guidance_amount * gx
        eps2e, _ = unet_apply(params, x_in, t, prompt_embeds_edit, config)
        eps_e = classifier_free_guidance(eps2e[:1], eps2e[1:], guidance_scale)
        edit_base = x_in[:1]  # uncond half (edit_pipeline.py:160)
        edit_new = ddim_step(schedule, eps_e, t, edit_base)
        edit_new = edit_new + noise_loss
        return (rec_new, edit_new), ()

    (rec, edit), _ = jax.lax.scan(body, (x_inv, x_inv), jnp.arange(T))
    return rec, edit
