"""Inversion engines as `lax.scan` phases.

Covers the reference's L4 layer for the P2P family
(/root/reference/models/p2p/inversion.py):
- plain DDIM inversion (cond-only `ddim_loop` :308-319, null `ddim_null_loop`
  :322-332, CFG `ddim_with_guidance_scale_loop` :335-348)
- DirectInversion `offset_calculate` (:375-391) with the `not_full` scale and
  `skip_step` ablations (:472-519) folded in as a traced per-step gate
- negative-prompt inversion (inversion.py:10-108) — pure embedding algebra
- null-text optimization (inversion.py:196-225): per-step Adam on the uncond
  embedding, early-stopped `lax.while_loop` inside a scan
- null-latent calculation (inversion.py:419-460) ablation

Every function is pure in (params, arrays); editors jit them once per model
config and reuse across the whole benchmark sweep.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from pnpinversion_tpu.configs import UNetConfig
from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.schedulers.ddim import (
    DDIMSchedule,
    classifier_free_guidance,
    ddim_inverse_step,
    ddim_step,
)

Array = jax.Array


def _eps(params, x, t, ctx, config: UNetConfig) -> Array:
    out, _ = unet_apply(params, x, t, ctx, config)
    return out


# ---------------------------------------------------------------------------
# DDIM inversion trajectory
# ---------------------------------------------------------------------------

def ddim_invert_loop(
    params,
    schedule: DDIMSchedule,
    latent: Array,
    embedding: Array,
    config: UNetConfig,
) -> Array:
    """Single-embedding DDIM inversion (cond-only or null, by caller's choice
    of ``embedding``). latent: (1, h, w, c); returns (T+1, 1, h, w, c) with
    [0] = input latent, [-1] = noised endpoint."""
    T = schedule.num_steps

    def body(lat, i):
        t = schedule.timesteps[T - 1 - i]
        eps = _eps(params, lat, t, embedding, config)
        nxt = ddim_inverse_step(schedule, eps, t, lat)
        return nxt, nxt

    _, traj = jax.lax.scan(body, latent, jnp.arange(T))
    return jnp.concatenate([latent[None], traj], axis=0)


def ddim_invert_loop_cfg(
    params,
    schedule: DDIMSchedule,
    latent: Array,
    uncond_embedding: Array,
    cond_embedding: Array,
    guidance_scale: Array,
    config: UNetConfig,
) -> Array:
    """CFG-guided inversion (ddim_with_guidance_scale_loop)."""
    T = schedule.num_steps
    ctx = jnp.concatenate([uncond_embedding, cond_embedding], axis=0)

    def body(lat, i):
        t = schedule.timesteps[T - 1 - i]
        eps2 = _eps(params, jnp.concatenate([lat, lat], axis=0), t, ctx, config)
        eps = classifier_free_guidance(eps2[:1], eps2[1:], guidance_scale)
        nxt = ddim_inverse_step(schedule, eps, t, lat)
        return nxt, nxt

    _, traj = jax.lax.scan(body, latent, jnp.arange(T))
    return jnp.concatenate([latent[None], traj], axis=0)


# ---------------------------------------------------------------------------
# DirectInversion offsets
# ---------------------------------------------------------------------------

def direct_inversion_offsets(
    params,
    schedule: DDIMSchedule,
    trajectory: Array,  # (T+1, 1, h, w, c) from ddim_invert_loop
    context: Array,  # (2B, 77, D): [uncond x B, cond x B]
    guidance_scale: Array,
    config: UNetConfig,
    step_gate: Optional[Array] = None,  # (T,) per-step offset scale (ablations)
) -> Tuple[Array, Array]:
    """Replay denoising with CFG, recording per-step rectification offsets
    loss_i = x*_{t-1} - x̂_{t-1} (the paper's 3 lines; inversion.py:375-391).

    Returns (noise_loss: (T, B, h, w, c), final_latents: (B, h, w, c)).
    ``step_gate`` folds in offset_calculate_not_full (scale<1) and
    offset_calculate_skip_step (zeros off-grid) without recompiling.
    """
    T = schedule.num_steps
    B = context.shape[0] // 2
    if step_gate is None:
        step_gate = jnp.ones((T,), dtype=trajectory.dtype)
    latent_cur = jnp.broadcast_to(trajectory[-1], (B,) + trajectory.shape[2:])

    def body(lat_cur, i):
        latent_prev = jnp.broadcast_to(trajectory[T - 1 - i], lat_cur.shape)
        t = schedule.timesteps[i]
        eps2 = _eps(params, jnp.concatenate([lat_cur] * 2, axis=0), t, context, config)
        eps = classifier_free_guidance(eps2[:B], eps2[B:], guidance_scale)
        prev_rec = ddim_step(schedule, eps, t, lat_cur)
        loss = (latent_prev - prev_rec) * step_gate[i]
        return prev_rec + loss, loss

    final, losses = jax.lax.scan(body, latent_cur, jnp.arange(T))
    return losses, final


def make_step_gate(num_steps: int, scale: float = 1.0, skip_step: int = 1,
                   dtype=jnp.float32) -> Array:
    """Host-side gate for the not_full / skip_step ablations."""
    import numpy as np

    gate = np.zeros((num_steps,), dtype=np.float32)
    gate[::skip_step] = scale
    return jnp.asarray(gate, dtype=dtype)


# ---------------------------------------------------------------------------
# Null-text optimization (NullInversion)
# ---------------------------------------------------------------------------

def null_text_optimization(
    params,
    schedule: DDIMSchedule,
    trajectory: Array,  # (T+1, 1, h, w, c)
    uncond_embedding: Array,  # (1, 77, D) starting point ("")
    cond_embedding: Array,  # (1, 77, D)
    guidance_scale: Array,
    config: UNetConfig,
    num_inner_steps: int = 10,
    epsilon: float = 1e-5,
) -> Array:
    """Per-step Adam on the uncond embedding (inversion.py:196-225).

    lr = 1e-2 * (1 - i/100); early stop when mse < epsilon + i*2e-5.
    Returns per-step embeddings (T, 1, 77, D).
    """
    T = schedule.num_steps

    def outer(carry, i):
        latent_cur, uncond = carry
        t = schedule.timesteps[i]
        latent_prev = trajectory[T - 1 - i]
        eps_cond = _eps(params, latent_cur, t, cond_embedding, config)
        lr = 1e-2 * (1.0 - i.astype(jnp.float32) / 100.0)
        opt = optax.adam(learning_rate=1.0)  # lr applied via scaling below
        thr = epsilon + i.astype(jnp.float32) * 2e-5

        def loss_fn(u):
            eps_uncond = _eps(params, latent_cur, t, u, config)
            eps = classifier_free_guidance(eps_uncond, eps_cond, guidance_scale)
            rec = ddim_step(schedule, eps, t, latent_cur)
            # f32 reduction: bf16 pipelines would both break the while_loop
            # carry dtype (init is f32 inf) and blur the 1e-5-scale
            # early-stop threshold
            d = (rec - latent_prev).astype(jnp.float32)
            return jnp.mean(d * d)

        def cond_fn(st):
            _, _, j, last_loss = st
            return (j < num_inner_steps) & (last_loss >= thr)

        def body_fn(st):
            u, opt_state, j, _ = st
            loss, grad = jax.value_and_grad(loss_fn)(u)
            updates, opt_state = opt.update(grad, opt_state, u)
            u = optax.apply_updates(u, jax.tree.map(lambda g: g * lr, updates))
            return (u, opt_state, j + 1, loss)

        if num_inner_steps > 0:
            init = (uncond, opt.init(uncond), jnp.int32(0), jnp.float32(jnp.inf))
            uncond, _, _, _ = jax.lax.while_loop(cond_fn, body_fn, init)

        # advance with the optimized embedding (inversion.py:222-224); the
        # cond row of the reference's b=2 call is exactly eps_cond from the
        # top of this step (same latent/t/context), so only the uncond row
        # is recomputed here
        eps_uncond = _eps(params, latent_cur, t, uncond, config)
        eps = classifier_free_guidance(eps_uncond, eps_cond, guidance_scale)
        latent_cur = ddim_step(schedule, eps, t, latent_cur)
        return (latent_cur, uncond), uncond

    (_, _), uncond_list = jax.lax.scan(
        outer, (trajectory[-1], uncond_embedding), jnp.arange(T)
    )
    return uncond_list


# ---------------------------------------------------------------------------
# Null-latent ablation (DirectInversion.null_latent_calculate)
# ---------------------------------------------------------------------------

def null_latent_offsets(
    params,
    schedule: DDIMSchedule,
    trajectory: Array,
    context: Array,  # (2B, 77, D)
    guidance_scale: Array,
    config: UNetConfig,
    num_inner_steps: int = 10,
    epsilon: float = 1e-5,
) -> Array:
    """inversion.py:419-460: optimize the uncond embedding per step, then
    record offsets between the optimized-trajectory latent and the plain
    CFG reconstruction. Returns (T, B, h, w, c)."""
    T = schedule.num_steps
    B = context.shape[0] // 2
    uncond0, cond = context[:B], context[B:]
    latent0 = jnp.broadcast_to(trajectory[-1], (B,) + trajectory.shape[2:])

    def outer(carry, i):
        latent_cur, uncond = carry
        t = schedule.timesteps[i]
        latent_prev = jnp.broadcast_to(trajectory[T - 1 - i], latent_cur.shape)
        lr = 1e-2 * (1.0 - i.astype(jnp.float32) / 100.0)
        opt = optax.adam(learning_rate=1.0)
        thr = epsilon + i.astype(jnp.float32) * 2e-5
        # the cond rows of every b=2B call in this step (reference's inner
        # Adam loop :430-446 AND both post-loop reconstructions :449-454)
        # see the same (latent_cur, t, cond) — the UNet is batch-pointwise,
        # so compute them once instead of 10+2 times
        eps_cond = _eps(params, latent_cur, t, cond, config)

        def loss_fn(u):
            eps_uncond = _eps(params, latent_cur, t, u, config)
            eps = classifier_free_guidance(eps_uncond, eps_cond, guidance_scale)
            rec = ddim_step(schedule, eps, t, latent_cur)
            # f32 reduction (see null_text_optimization)
            d = (rec[:1] - latent_prev[:1]).astype(jnp.float32)
            return jnp.mean(d * d)

        def cond_fn(st):
            _, _, j, last_loss = st
            return (j < num_inner_steps) & (last_loss >= thr)

        def body_fn(st):
            u, opt_state, j, _ = st
            loss, grad = jax.value_and_grad(loss_fn)(u)
            updates, opt_state = opt.update(grad, opt_state, u)
            u = optax.apply_updates(u, jax.tree.map(lambda g: g * lr, updates))
            return (u, opt_state, j + 1, loss)

        if num_inner_steps > 0:
            init = (uncond, opt.init(uncond), jnp.int32(0), jnp.float32(jnp.inf))
            uncond, _, _, _ = jax.lax.while_loop(cond_fn, body_fn, init)

        # plain-CFG reconstruction with the ORIGINAL context (:449-452)
        eps_u0 = _eps(params, latent_cur, t, uncond0, config)
        eps = classifier_free_guidance(eps_u0, eps_cond, guidance_scale)
        prev_rec = ddim_step(schedule, eps, t, latent_cur)
        # optimized-context step for the FULL batch (:454 —
        # get_noise_pred(...)[0] indexes prev_step's
        # (prev_sample, difference_scale) tuple (:247-260,:287), i.e. the
        # whole-batch reconstruction, not batch row 0). Rows 1+ of the
        # optimized uncond are untouched by the inner Adam loop (the row-0
        # loss gives them exactly zero grad, so Adam's update is exactly
        # zero), so their optimized step equals prev_rec bit-for-bit and
        # loss rows 1+ are exactly zero — only row 0 needs the extra UNet
        # row; rows 1+ of the carry stay on the plain-CFG reconstruction.
        eps_uo0 = _eps(params, latent_cur[:1], t, uncond[:1], config)
        epso0 = classifier_free_guidance(eps_uo0, eps_cond[:1], guidance_scale)
        lat_opt0 = ddim_step(schedule, epso0, t, latent_cur[:1])
        loss = jnp.concatenate(
            [lat_opt0 - prev_rec[:1], jnp.zeros_like(prev_rec[1:])], axis=0)
        return (prev_rec + loss, uncond), loss

    (_, _), losses = jax.lax.scan(outer, (latent0, uncond0), jnp.arange(T))
    return losses
