"""P2P-family guidance sampling loops as `lax.scan` phases.

Parity targets:
- p2p_guidance_forward / _single_branch:
  /root/reference/models/p2p/p2p_guidance_forward.py:21-100
- direct_inversion_p2p_guidance_forward (+_add_target): ibid. :103-213 —
  the per-step source-branch offset add is the paper's "3 lines".
- proximal_guidance_forward: /root/reference/models/p2p/proximal_guidance_forward.py

One compiled scan serves all DirectInversion variants: the offset row-mask
(which rows receive noise_loss) and the guidance scale are traced inputs.
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from pnpinversion_tpu.configs import UNetConfig
from pnpinversion_tpu.control.base import BaseControl, NO_CONTROL
from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.schedulers.ddim import (
    DDIMSchedule,
    classifier_free_guidance,
    ddim_step,
    ddim_step_recon_guided,
)

Array = jax.Array


def guidance_forward(
    params,
    schedule: DDIMSchedule,
    config: UNetConfig,
    latent: Array,  # (1, h, w, c) or (B, h, w, c) start latent x_T
    cond_embeddings: Array,  # (B, 77, D)
    uncond_embeddings: Array,  # (B, 77, D) or per-step (T, 1|B, 77, D)
    guidance_scale: Array,
    control: BaseControl = NO_CONTROL,
    tensors: Optional[Dict[str, Array]] = None,
    noise_loss: Optional[Array] = None,  # (T, B, h, w, c) DirectInversion offsets
    offset_row_mask: Optional[Array] = None,  # (B,) 1.0 where offsets apply
    init_state: Optional[Dict[str, Array]] = None,
) -> Array:
    """CFG denoising with attention control and optional per-step offsets.

    Returns final latents (B, h, w, c).
    """
    T = schedule.num_steps
    B = cond_embeddings.shape[0]
    latents0 = jnp.broadcast_to(latent, (B,) + latent.shape[1:])

    per_step_uncond = uncond_embeddings.ndim == 4
    if noise_loss is None:
        noise_loss = jnp.zeros((T, B) + latent.shape[1:], dtype=latent.dtype)
    if offset_row_mask is None:
        offset_row_mask = jnp.zeros((B,), dtype=latent.dtype)
    state0 = init_state if init_state is not None else control.init_state(
        B, latent.dtype, heads=config.num_heads
    )

    def body(carry, i):
        latents, state = carry
        t = schedule.timesteps[i]
        if per_step_uncond:
            unc = jnp.broadcast_to(uncond_embeddings[i], cond_embeddings.shape)
        else:
            unc = uncond_embeddings
        ctx = jnp.concatenate([unc, cond_embeddings], axis=0)
        x_in = jnp.concatenate([latents, latents], axis=0)
        eps2, state = unet_apply(
            params, x_in, t, ctx, config, control, tensors, state, step=i
        )
        eps = classifier_free_guidance(eps2[:B], eps2[B:], guidance_scale)
        latents = ddim_step(schedule, eps, t, latents)
        latents = latents + noise_loss[i] * offset_row_mask[:, None, None, None]
        latents, state = control.step_callback(latents, tensors, state, i)
        return (latents, state), ()

    (latents, _), _ = jax.lax.scan(body, (latents0, state0), jnp.arange(T))
    return latents


def fused_direct_inversion_edit(
    params,
    schedule: DDIMSchedule,
    config: UNetConfig,
    trajectory: Array,  # (T+1, 1, h, w, c) inversion trajectory
    cond_embeddings: Array,  # (B, 77, D)
    uncond_embeddings: Array,  # (B, 77, D)
    guidance_scale: Array,
    control: BaseControl,
    tensors: Dict[str, Array],
    offset_row_mask: Array,  # (B,)
    step_gate: Array,  # (T,)
) -> Array:
    """DirectInversion offsets + controlled edit in ONE batch-2B scan.

    The reference runs an offset replay (50 x b=4) and then the edit pass
    (50 x b=4) as separate loops (inversion.py:375-391,
    p2p_guidance_forward.py:135-173). With full offsets the replay's latent
    re-snaps to the inversion trajectory every step, and the controller never
    modifies the source row's outputs (P2P edits only target rows; LocalBlend
    blends rows >= 1 toward row 0), so the edit pass's own source row IS the
    offset replay: loss_i = traj[T-1-i] - ddim_step(eps_source_row). One
    batch-2B scan therefore computes both — the reference's entire offset
    phase (~1/3 of its per-image UNet cost) falls out algebraically.
    ``control`` uses the plain spec (source row = group 0's base row).

    Returns final edit latents (B, h, w, c).
    """
    T = schedule.num_steps
    B = cond_embeddings.shape[0]
    x_t = jnp.broadcast_to(trajectory[-1], (B,) + trajectory.shape[2:])
    ctx = jnp.concatenate([uncond_embeddings, cond_embeddings], axis=0)
    state0 = control.init_state(B, x_t.dtype, heads=config.num_heads)
    rm = offset_row_mask[:, None, None, None]

    def body(carry, i):
        latents, state = carry
        t = schedule.timesteps[i]
        latent_prev = trajectory[T - 1 - i]  # (1, h, w, c)
        x_in = jnp.concatenate([latents, latents], axis=0)
        eps2, state = unet_apply(
            params, x_in, t, ctx, config, control, tensors, state, step=i)
        eps = classifier_free_guidance(eps2[:B], eps2[B:], guidance_scale)
        stepped = ddim_step(schedule, eps, t, latents)
        loss = (latent_prev - stepped[:1]) * step_gate[i]
        latents = stepped + loss * rm
        latents, state = control.step_callback(latents, tensors, state, i)
        return (latents, state), ()

    (latents, _), _ = jax.lax.scan(body, (x_t, state0), jnp.arange(T))
    return latents


def fused_direct_inversion_edit_srcfree(
    params,
    schedule: DDIMSchedule,
    config: UNetConfig,
    trajectory: Array,  # (T+1, 1, h, w, c) inversion trajectory
    cond_embeddings: Array,  # (B, 77, D)
    uncond_embeddings: Array,  # (B, 77, D)
    guidance_scale: Array,
    control: BaseControl,
    tensors: Dict[str, Array],
) -> Array:
    """Full-offset DirectInversion edit in a (2B-1)-row scan.

    With full offsets (scale 1, no skip) the source row of
    ``fused_direct_inversion_edit`` re-snaps to the inversion trajectory every
    step — ``stepped[:1]`` cancels out of ``stepped + (traj - stepped[:1])``,
    so ``latents[0] == trajectory[T-1-i]`` identically. A cond-half controller
    (P2P edits only ``attn[h//2:]``, attention_control.py:183-184) never reads
    or writes the uncond half, so the uncond-source UNet row is dead compute:
    its eps enters only the source row's CFG step, whose output the offset add
    cancels. Dropping it cuts the UNet batch from 2B to 2B-1 rows (-25% FLOPs
    at B=2) with identical math. Batch layout: [uncond x (B-1), cond x B].

    ``control`` must use a spec with ``uncond_rows = B - 1``. NOT valid for
    controllers that touch the uncond half (MasaCtrl mutual self-attention)
    or for partial-offset ablations (scale/interval/add-target), where the
    source row's own stepped latent is consumed.
    """
    T = schedule.num_steps
    B = cond_embeddings.shape[0]
    x_t = jnp.broadcast_to(trajectory[-1], (B,) + trajectory.shape[2:])
    ctx = jnp.concatenate([uncond_embeddings[1:], cond_embeddings], axis=0)
    state0 = control.init_state(B, x_t.dtype, heads=config.num_heads)

    def body(carry, i):
        latents, state = carry
        t = schedule.timesteps[i]
        x_in = jnp.concatenate([latents[1:], latents], axis=0)
        eps2, state = unet_apply(
            params, x_in, t, ctx, config, control, tensors, state, step=i)
        eps_t = classifier_free_guidance(eps2[: B - 1], eps2[B:], guidance_scale)
        stepped_t = ddim_step(schedule, eps_t, t, latents[1:])
        latents = jnp.concatenate([trajectory[T - 1 - i], stepped_t], axis=0)
        latents, state = control.step_callback(latents, tensors, state, i)
        return (latents, state), ()

    (latents, _), _ = jax.lax.scan(body, (x_t, state0), jnp.arange(T))
    return latents


def guidance_forward_single_branch(
    params,
    schedule: DDIMSchedule,
    config: UNetConfig,
    latent: Array,
    cond_embeddings: Array,  # (B, 77, D)
    uncond_per_step: Array,  # (T, 1, 77, D) optimized for row 0
    uncond_static: Array,  # (B, 77, D) plain "" embeddings for rows 1:
    guidance_scale: Array,
    control: BaseControl = NO_CONTROL,
    tensors: Optional[Dict[str, Array]] = None,
) -> Array:
    """Null-text ablation: optimized uncond on the source row only
    (p2p_guidance_forward_single_branch, :64-100)."""
    T = schedule.num_steps
    B = cond_embeddings.shape[0]
    latents0 = jnp.broadcast_to(latent, (B,) + latent.shape[1:])
    state0 = control.init_state(B, latent.dtype, heads=config.num_heads)

    def body(carry, i):
        latents, state = carry
        t = schedule.timesteps[i]
        unc = jnp.concatenate([uncond_per_step[i], uncond_static[1:]], axis=0)
        ctx = jnp.concatenate([unc, cond_embeddings], axis=0)
        x_in = jnp.concatenate([latents, latents], axis=0)
        eps2, state = unet_apply(
            params, x_in, t, ctx, config, control, tensors, state, step=i
        )
        eps = classifier_free_guidance(eps2[:B], eps2[B:], guidance_scale)
        latents = ddim_step(schedule, eps, t, latents)
        latents, state = control.step_callback(latents, tensors, state, i)
        return (latents, state), ()

    (latents, _), _ = jax.lax.scan(body, (latents0, state0), jnp.arange(T))
    return latents


def _dilate(mask: Array, radius: int) -> Array:
    """Binary dilation via max-pool (proximal_guidance_forward.py:7-17).
    mask: (B, h, w, c) NHWC."""
    k = 2 * radius + 1
    return jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max,
        window_dimensions=(1, k, k, 1), window_strides=(1, 1, 1, 1),
        padding="SAME",
    )


def proximal_guidance_forward(
    params,
    schedule: DDIMSchedule,
    config: UNetConfig,
    latent: Array,
    cond_embeddings: Array,
    uncond_embeddings: Array,  # (B,77,D) or (T,1,77,D)
    guidance_scale: Array,
    control: BaseControl = NO_CONTROL,
    tensors: Optional[Dict[str, Array]] = None,
    edit_stage: bool = True,
    prox: Optional[str] = None,  # None | 'l1' | 'l0'  (static)
    quantile: float = 0.7,
    image_enc: Optional[Array] = None,  # (1,h,w,c) ref latent for recon guidance
    recon_lr: float = 0.1,
    recon_t: int = 400,
    inversion_guidance: bool = False,
    x_stars: Optional[Array] = None,  # (T+1, 1, h, w, c)
    dilate_mask: int = 1,
) -> Array:
    """ProxEdit sampling (proximal_guidance_forward.py:19-166).

    The CFG delta is soft-(l1)/hard-(l0) shrunk by a quantile threshold; the
    over-threshold region defines an edit mask used for background
    reconstruction guidance toward ``image_enc`` and/or the inversion latents.
    """
    T = schedule.num_steps
    B = cond_embeddings.shape[0]
    latents0 = jnp.broadcast_to(latent, (B,) + latent.shape[1:])
    per_step_uncond = uncond_embeddings.ndim == 4
    state0 = control.init_state(B, latent.dtype, heads=config.num_heads)
    use_prox = edit_stage and prox is not None

    def body(carry, i):
        latents, state = carry
        t = schedule.timesteps[i]
        if per_step_uncond:
            unc = jnp.broadcast_to(uncond_embeddings[i], cond_embeddings.shape)
        else:
            unc = uncond_embeddings
        ctx = jnp.concatenate([unc, cond_embeddings], axis=0)
        x_in = jnp.concatenate([latents, latents], axis=0)
        eps2, state = unet_apply(
            params, x_in, t, ctx, config, control, tensors, state, step=i
        )
        eps_u, eps_c = eps2[:B], eps2[B:]

        if use_prox:
            delta = eps_c - eps_u
            if quantile > 0:
                threshold = jnp.quantile(jnp.abs(delta).astype(jnp.float32), quantile)
            else:
                threshold = jnp.asarray(-quantile, jnp.float32)
            threshold = threshold.astype(delta.dtype)
            clamped = jnp.clip(delta, -threshold, threshold)
            shrunk = delta - clamped
            if prox == "l1":
                shrunk = jnp.where(shrunk > 0, shrunk - threshold, shrunk)
                shrunk = jnp.where(shrunk < 0, shrunk + threshold, shrunk)
            # recon window: (recon_t>0 and t<recon_t) or (recon_t<0 and t>-recon_t)
            if recon_t > 0:
                in_window = t < recon_t
            else:
                in_window = t > -recon_t
            mask_edit = (jnp.abs(shrunk) > threshold).astype(latents.dtype)
            if dilate_mask > 0:
                mask_edit = _dilate(mask_edit, int(dilate_mask))
            recon_mask = (1.0 - mask_edit) * in_window.astype(latents.dtype)
            eps = eps_u + guidance_scale * shrunk
            lat_next, _ = ddim_step_recon_guided(
                schedule, eps, t, latents,
                ref_image=image_enc if image_enc is not None else None,
                recon_lr=recon_lr if image_enc is not None else 0.0,
                recon_mask=recon_mask if image_enc is not None else None,
            )
            if inversion_guidance and x_stars is not None:
                x_star_prev = jnp.broadcast_to(x_stars[T - 1 - i], lat_next.shape)
                lat_next = lat_next - recon_lr * (lat_next - x_star_prev) * recon_mask
            latents = lat_next
        else:
            eps = classifier_free_guidance(eps_u, eps_c, guidance_scale)
            latents = ddim_step(schedule, eps, t, latents)

        latents, state = control.step_callback(latents, tensors, state, i)
        return (latents, state), ()

    (latents, _), _ = jax.lax.scan(body, (latents0, state0), jnp.arange(T))
    return latents
