"""StyleDiffusion VaeInversion: map-capturing DDIM inversion + per-step
mapping-network training.

Parity: /root/reference/models/stylediffusion/inversion.py —
``ddim_loop`` with 16x16 cross-map capture (:108-144) and ``optimization``
(:157-232): for each step i, warm-start mapper_i from mapper_{i-1}, run up to
ceil(num_inner_steps * e^{-0.1 i}) Adam iterations (lr 1e-2*(1-i/100)) on
latent-MSE + cross-attn-MSE, then advance the trajectory with the trained
mapper.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pnpinversion_tpu.configs import UNetConfig
from pnpinversion_tpu.control.stylediffusion import StyleStoreControl, StyleTrainControl
from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.schedulers.ddim import (
    DDIMSchedule,
    classifier_free_guidance,
    ddim_inverse_step,
    ddim_step,
)

Array = jax.Array


def ddim_invert_with_maps(
    params,
    schedule: DDIMSchedule,
    latent: Array,
    cond_embedding: Array,
    config: UNetConfig,
    num_lb_slots: int,
) -> Tuple[Array, Dict[str, Array]]:
    """Cond-only inversion capturing per-step 16x16 cross maps.
    Returns (trajectory (T+1,...), maps dict of (T, B, H, 256, 77))."""
    T = schedule.num_steps
    store = StyleStoreControl()

    def body(lat, i):
        t = schedule.timesteps[T - 1 - i]
        eps, st = unet_apply(params, lat, t, cond_embedding, config, store, {}, {}, step=i)
        nxt = ddim_inverse_step(schedule, eps, t, lat)
        maps = {k: st[k] for k in sorted(st) if k.startswith("sd_maps_")}
        return nxt, (nxt, maps)

    _, (traj, maps) = jax.lax.scan(body, latent, jnp.arange(T))
    return jnp.concatenate([latent[None], traj], axis=0), maps


def inner_steps_schedule(num_steps: int, num_inner_steps: int) -> np.ndarray:
    x = np.linspace(0, num_steps - 1, num_steps)
    return np.ceil(num_inner_steps * np.exp(-0.1 * x)).astype(np.int32)


def train_mappers(
    params,
    schedule: DDIMSchedule,
    trajectory: Array,  # (T+1, 1, h, w, c)
    gt_maps: Dict[str, Array],  # (T, 1, H, 256, 77) per slot, from inversion
    img_tokens: Array,  # (1, 197, width)
    uncond_embedding: Array,
    cond_embedding: Array,
    guidance_scale: Array,
    mapper0: Dict[str, Any],  # ONE step's mapper params (init)
    config: UNetConfig,
    num_inner_steps: int = 100,
    epsilon: float = 1e-5,
) -> Dict[str, Any]:
    """Returns trained mapper params stacked over T (leading axis)."""
    T = schedule.num_steps
    inner = jnp.asarray(inner_steps_schedule(T, num_inner_steps))
    train_ctrl = StyleTrainControl("all")
    adv_ctrl = StyleTrainControl("cond_half")

    def body(carry, i):
        latent_cur, mapper = carry  # warm start from the previous step
        t = schedule.timesteps[i]
        latent_prev = trajectory[T - 1 - i]
        # target maps: ddim_inv_attn[min(T-i, T-1)] (inversion.py:206 + :145)
        gt_idx = jnp.minimum(T - i, T - 1)
        gt_i = {k: v[gt_idx] for k, v in gt_maps.items()}
        eps_u, _ = unet_apply(params, latent_cur, t, uncond_embedding, config)
        lr = 1e-2 * (1.0 - i.astype(jnp.float32) / 100.0)
        thr = epsilon + i.astype(jnp.float32) * 2e-5
        opt = optax.adam(1.0)

        def loss_fn(mp):
            tensors = {"sd_mapper_i": mp, "img_tokens": img_tokens}
            eps_c, st = unet_apply(params, latent_cur, t, cond_embedding, config,
                                   train_ctrl, tensors, {}, step=i)
            eps = classifier_free_guidance(eps_u, eps_c, guidance_scale)
            rec = ddim_step(schedule, eps, t, latent_cur)
            dlat = (rec - latent_prev).astype(jnp.float32)
            latent_loss = jnp.mean(dlat * dlat)  # f32: bf16 would break the
            # while_loop carry dtype and blur the early-stop threshold
            attn_loss = jnp.zeros((), jnp.float32)
            for k, gt in gt_i.items():
                attn_loss = attn_loss + jnp.mean(
                    (st[k].astype(jnp.float32) - gt.astype(jnp.float32)) ** 2)
            return latent_loss + attn_loss

        def cond_fn(stt):
            _, _, j, last = stt
            return (j < inner[i]) & (last >= thr)

        def body_fn(stt):
            mp, ost, j, _ = stt
            loss, grads = jax.value_and_grad(loss_fn)(mp)
            updates, ost = opt.update(grads, ost, mp)
            mp = optax.apply_updates(mp, jax.tree.map(lambda g: g * lr, updates))
            return (mp, ost, j + 1, loss)

        init = (mapper, opt.init(mapper), jnp.int32(0), jnp.float32(jnp.inf))
        mapper, _, _, _ = jax.lax.while_loop(cond_fn, body_fn, init)

        # advance with the trained mapper (inversion.py:222-224)
        tensors = {"sd_mapper_i": mapper, "img_tokens": img_tokens}
        ctx = jnp.concatenate([uncond_embedding, cond_embedding], axis=0)
        eps2, _ = unet_apply(params, jnp.concatenate([latent_cur] * 2, axis=0),
                             t, ctx, config, adv_ctrl, tensors, {}, step=i)
        eps = classifier_free_guidance(eps2[:1], eps2[1:], guidance_scale)
        latent_cur = ddim_step(schedule, eps, t, latent_cur)
        return (latent_cur, mapper), mapper

    (_, _), stacked = jax.lax.scan(body, (trajectory[-1], mapper0), jnp.arange(T))
    return stacked
