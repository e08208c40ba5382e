"""Edit-conditioned latent-diffusion training as one jitted sharded step.

Objective parity (instructpix2pix ``ddpm_edit.py``):

- ``get_input`` (:686-717): z = sample of the VAE posterior of the edited
  image x scaling_factor; c_concat = posterior **mode** of the source image,
  UNSCALED; per-item classifier-free dropout with uniform r ~ U[0,1):
  text -> null prompt when r < 2u, image -> zeros when u <= r < 3u (so both
  drop together when u <= r < 2u), u = 0.05.
- ``p_losses`` (:1025-1059): eps-parameterization MSE, per-item pixel mean
  then batch mean (logvar_t = 0, l_simple_weight = 1,
  original_elbo_weight = 0 in the shipped config).
- optimizer: AdamW (ddpm_edit.py:442-448, torch defaults beta=(0.9,0.999),
  eps=1e-8, wd=0.01), warmup LambdaLinearScheduler (configs/train.yaml:26-33),
  grad accumulation (lightning trainer accumulate_grad_batches=4), EMA with
  LitEMA's (1+n)/(10+n) warmup, optional global-norm clipping
  (InstructDiffusion main.py:315-334).

TPU-native execution replaces the reference's two distributed stacks
(Lightning DDP for ip2p; torch.distributed + DeepSpeed fp16/ZeRO for
InstructDiffusion, utils/deepspeed.py:7-55):

- one jitted train step over a (dp[, tp]) `Mesh`; the batch is dp-sharded
  and XLA inserts the gradient all-reduce (the NCCL allreduce equivalent
  rides ICI automatically).
- gradient accumulation is a `lax.scan` over the leading microbatch axis
  INSIDE the step — one dispatch per optimizer step, not per microbatch.
- bf16 compute with f32 master weights; bf16 needs no DeepSpeed-style loss
  scaling (that machinery exists for CUDA fp16's narrow exponent).
- ZeRO-style optimizer-state sharding: Adam moments are sharded over dp
  (``zero_shardings``); GSPMD partitions the elementwise update and
  all-gathers updated params — DeepSpeed stage-1 semantics without a
  runtime engine.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pnpinversion_tpu.configs import StableDiffusionConfig
from pnpinversion_tpu.models.clip_text import clip_text_apply
from pnpinversion_tpu.models.vae import vae_encode_moments
from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.parallel.sweep import param_shardings

Array = jax.Array
Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Hyperparameters, defaults = configs/train.yaml + torch AdamW."""

    base_lr: float = 1e-4
    scale_lr: bool = True            # lr = accum * n_dp * batch * base_lr (main.py:743-747)
    warmup_steps: int = 0            # train.yaml warm_up_steps: [0]
    f_start: float = 1e-6            # LambdaLinearScheduler f_start
    betas: Tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    weight_decay: float = 0.01       # torch.optim.AdamW default
    clip_grad: float = 0.0           # InstructDiffusion trainer.clip_grad
    accum: int = 4                   # accumulate_grad_batches
    uncond_prob: float = 0.05        # ddpm_edit.py:687 uncond=0.05
    ema_decay: float = 0.9999        # LitEMA default
    zero: bool = True                # shard Adam moments over dp
    dtype: Any = jnp.bfloat16        # compute dtype (master weights stay f32)
    remat: bool = False              # jax.checkpoint the UNet forward: trade
    # ~1/3 more FLOPs for O(depth) less activation HBM. On one v5e chip the
    # f32 train state alone (params+EMA+2 Adam moments on 860M) is ~13.8 GB
    # of 16, so production microbatches need rematerialization; multi-chip
    # dp runs with ZeRO sharding usually don't.


def lambda_linear_lr(cfg: TrainConfig, n_dp: int, batch_per_step: int):
    """LambdaLinearScheduler with the shipped near-infinite cycle length:
    linear f_start->1 over warmup, then constant (ldm/lr_scheduler.py)."""
    lr = cfg.base_lr
    if cfg.scale_lr:
        lr = cfg.accum * n_dp * batch_per_step * cfg.base_lr

    def sched(step):
        if cfg.warmup_steps <= 0:
            return lr
        f = cfg.f_start + (1.0 - cfg.f_start) * jnp.minimum(
            step / cfg.warmup_steps, 1.0)
        return lr * f

    return sched


def make_optimizer(cfg: TrainConfig, n_dp: int, batch_per_step: int):
    tx = [optax.clip_by_global_norm(cfg.clip_grad)] if cfg.clip_grad > 0 else []
    tx.append(optax.adamw(
        lambda_linear_lr(cfg, n_dp, batch_per_step),
        b1=cfg.betas[0], b2=cfg.betas[1], eps=cfg.eps,
        weight_decay=cfg.weight_decay))
    return optax.chain(*tx)


def extend_conv_in(unet_params: Params, in_channels: int) -> Params:
    """Widen conv_in's input channels by zero-padding the HWIO kernel
    (axis 2) — the ip2p initialization: extra image-conditioning channels
    start at zero so step 0 reproduces the pretrained text-to-image model."""
    p = dict(unet_params)
    kern = p["conv_in"]["kernel"]
    cur = kern.shape[2]
    assert in_channels >= cur, (in_channels, cur)
    if in_channels > cur:
        pad = jnp.zeros(kern.shape[:2] + (in_channels - cur, kern.shape[3]),
                        kern.dtype)
        p["conv_in"] = dict(p["conv_in"], kernel=jnp.concatenate([kern, pad], axis=2))
    return p


def cond_dropout_masks(r: Array, uncond_prob: float) -> Tuple[Array, Array]:
    """(drop_prompt, keep_image) bool masks from per-item uniforms r.
    Exact ddpm_edit.py:702-704 rule."""
    u = uncond_prob
    drop_prompt = r < 2 * u
    keep_image = ~((r >= u) & (r < 3 * u))
    return drop_prompt, keep_image


def zero_shardings(mesh: Mesh, tree):
    """ZeRO-1-style placement: shard each float leaf along its largest
    dp-divisible axis; scalars/indivisible leaves replicate. Applied to the
    Adam moments (same tree shape as params)."""
    dp = mesh.shape["dp"]

    def spec(leaf):
        shape = getattr(leaf, "shape", ())
        if dp > 1:
            for ax in sorted(range(len(shape)), key=lambda a: -shape[a]):
                if shape[ax] % dp == 0 and shape[ax] >= dp:
                    return P(*(["dp" if a == ax else None for a in range(len(shape))]))
        return P()

    return jax.tree.map(lambda l: NamedSharding(mesh, spec(l)), tree)


class EditTrainer:
    """Owns the jitted train/val steps and the sharded TrainState.

    state = {"params": f32 unet, "ema": f32 unet, "opt": optax state,
             "step": int32}. The VAE + text encoder are frozen inputs
    (cond_stage_trainable: false, first stage frozen — train.yaml).
    """

    def __init__(self, model_config: StableDiffusionConfig, frozen: Params,
                 unet_params: Params, mesh: Mesh, cfg: TrainConfig,
                 batch_per_step: int, null_ids: np.ndarray):
        self.config = model_config
        self.cfg = cfg
        self.mesh = mesh
        n_dp = mesh.shape["dp"]
        self.tx = make_optimizer(cfg, n_dp, batch_per_step)
        self._lr = lambda_linear_lr(cfg, n_dp, batch_per_step)

        f32 = lambda t: jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        unet_params = f32(unet_params)

        self.param_sh = param_shardings(mesh, unet_params)
        opt0 = self.tx.init(unet_params)
        self.opt_sh = (zero_shardings(mesh, opt0) if cfg.zero
                       else jax.tree.map(lambda _: NamedSharding(mesh, P()), opt0))
        rep = NamedSharding(mesh, P())
        self.state_sh = {"params": self.param_sh, "ema": self.param_sh,
                         "opt": self.opt_sh, "step": rep}
        place = lambda t, sh: jax.tree.map(
            lambda x, s: jax.device_put(x, s), t, sh)
        self.state = {
            "params": place(unet_params, self.param_sh),
            "ema": place(unet_params, self.param_sh),
            "opt": place(opt0, self.opt_sh),
            "step": jax.device_put(jnp.zeros((), jnp.int32), rep),
        }
        self.frozen = place(f32(frozen),
                            jax.tree.map(lambda _: rep, frozen))
        self.null_ids = jnp.asarray(null_ids, jnp.int32)  # (77,)
        self._train_step = self._build_step(train=True)
        self._val_step = self._build_step(train=False)

    # ------------------------------------------------------------------ loss
    def _microbatch_loss(self, params: Params, frozen: Params, edited: Array,
                         cond_image: Array, ids: Array, rng: Array) -> Array:
        cfg, ucfg, vcfg, tcfg = (self.cfg, self.config.unet, self.config.vae,
                                 self.config.text)
        dt = cfg.dtype
        B = edited.shape[0]
        kz, kt, kn, kd = jax.random.split(rng, 4)

        cast = lambda t: jax.tree.map(
            lambda x: x.astype(dt)
            if jnp.issubdtype(x.dtype, jnp.floating) else x, t)
        p, fz = cast(params), cast(frozen)

        # --- conditioning (ddpm_edit.py get_input) -----------------------
        mean, logvar = vae_encode_moments(fz["vae"], edited.astype(dt), vcfg)
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(kz, mean.shape, dt)
        z = z * vcfg.scaling_factor
        img_cond, _ = vae_encode_moments(fz["vae"], cond_image.astype(dt), vcfg)

        ids2 = jnp.concatenate(
            [ids, jnp.broadcast_to(self.null_ids[None], ids.shape[:1] + self.null_ids.shape)],
            axis=0)
        ctx2 = clip_text_apply(fz["text"], ids2, tcfg, dtype=dt)
        ctx, null_ctx = ctx2[:B], ctx2[B:]

        r = jax.random.uniform(kd, (B,))
        drop_prompt, keep_image = cond_dropout_masks(r, cfg.uncond_prob)
        ctx = jnp.where(drop_prompt[:, None, None], null_ctx, ctx)
        img_cond = img_cond * keep_image[:, None, None, None].astype(dt)

        # --- q_sample + eps MSE (ddpm_edit.py p_losses) ------------------
        acp = jnp.asarray(self.schedule_acp, jnp.float32)
        t = jax.random.randint(kt, (B,), 0, acp.shape[0])
        a = acp[t][:, None, None, None]
        noise = jax.random.normal(kn, z.shape, dt)
        x_noisy = (jnp.sqrt(a) * z.astype(jnp.float32)
                   + jnp.sqrt(1.0 - a) * noise.astype(jnp.float32)).astype(dt)
        unet_fwd = lambda pp, x, tt, cc: unet_apply(pp, x, tt, cc, ucfg)[0]
        if cfg.remat:
            unet_fwd = jax.checkpoint(unet_fwd)
        eps = unet_fwd(p, jnp.concatenate([x_noisy, img_cond], axis=-1), t, ctx)
        err = (eps.astype(jnp.float32) - noise.astype(jnp.float32)) ** 2
        return jnp.mean(jnp.mean(err, axis=(1, 2, 3)))

    # ------------------------------------------------------------------ step
    @property
    def schedule_acp(self) -> np.ndarray:
        # kept as NUMPY: a jnp constant cached on self during one trace
        # would leak that trace's tracer into the next jit (val after train)
        if not hasattr(self, "_acp"):
            from pnpinversion_tpu.schedulers.ddim import make_betas

            betas = make_betas()
            self._acp = np.cumprod(1.0 - betas.astype(np.float64)).astype(np.float32)
        return self._acp

    def _build_step(self, train: bool):
        cfg = self.cfg
        dp = NamedSharding(self.mesh, P(None, "dp"))
        rep = NamedSharding(self.mesh, P())

        def accum_loss_and_grad(params, frozen, batch, rng):
            def one(carry, xs):
                edited, cond_image, ids, key = xs
                if train:
                    loss, g = jax.value_and_grad(self._microbatch_loss)(
                        params, frozen, edited, cond_image, ids, key)
                    return (carry[0] + loss, jax.tree.map(jnp.add, carry[1], g)), ()
                loss = self._microbatch_loss(
                    params, frozen, edited, cond_image, ids, key)
                return (carry[0] + loss, carry[1]), ()

            A = batch["edited"].shape[0]
            keys = jax.random.split(rng, A)
            zero_g = jax.tree.map(
                lambda x: jnp.zeros(x.shape, jnp.float32), params)
            (loss, grads), _ = jax.lax.scan(
                one, (jnp.zeros((), jnp.float32), zero_g),
                (batch["edited"], batch["cond_image"], batch["ids"], keys))
            return loss / A, jax.tree.map(lambda g: g / A, grads)

        if not train:
            def val_step(state, frozen, batch, rng):
                loss, _ = accum_loss_and_grad(state["ema"], frozen, batch, rng)
                return loss

            return jax.jit(
                val_step,
                in_shardings=(self.state_sh,
                              jax.tree.map(lambda _: rep, self.frozen),
                              {"edited": dp, "cond_image": dp, "ids": dp},
                              rep),
                out_shardings=rep)

        def train_step(state, frozen, batch, rng):
            loss, grads = accum_loss_and_grad(state["params"], frozen, batch, rng)
            gnorm = optax.global_norm(grads)
            updates, opt = self.tx.update(grads, state["opt"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            step = state["step"] + 1
            # LitEMA warmup decay (stable_diffusion/ldm/modules/ema.py)
            d = jnp.minimum(cfg.ema_decay, (1.0 + step) / (10.0 + step))
            ema = jax.tree.map(
                lambda e, q: (e * d + q.astype(jnp.float32) * (1.0 - d))
                if jnp.issubdtype(q.dtype, jnp.floating) else q,
                state["ema"], params)
            new_state = {"params": params, "ema": ema, "opt": opt, "step": step}
            return new_state, {"loss": loss, "grad_norm": gnorm}

        # donate the old state so params+moments aren't double-buffered
        # through the update — EXCEPT on the CPU backend: XLA:CPU's
        # in-process collectives deadlock when a donated input aliases a
        # collective operand (one partition never reaches the all-gather
        # rendezvous; reproduced on the 8-virtual-device test mesh).
        donate = (0,) if jax.default_backend() != "cpu" else ()
        return jax.jit(
            train_step,
            in_shardings=(self.state_sh,
                          jax.tree.map(lambda _: rep, self.frozen),
                          {"edited": dp, "cond_image": dp, "ids": dp},
                          rep),
            out_shardings=(self.state_sh, rep),
            donate_argnums=donate)

    # ------------------------------------------------------------------- API
    def train_step(self, batch: Dict[str, Array], rng: Array) -> Dict[str, float]:
        """batch: edited/cond_image (A, B, H, W, 3) f32, ids (A, B, 77) i32.
        A = accumulation microbatches, B = per-step batch (dp-sharded)."""
        self.state, metrics = self._train_step(self.state, self.frozen, batch, rng)
        return metrics

    def val_step(self, batch: Dict[str, Array], rng: Array) -> Array:
        """Validation loss under the EMA weights (the reference copies EMA
        into the model for its val pass, main.py:392-396)."""
        return self._val_step(self.state, self.frozen, batch, rng)

    def learning_rate(self, step: Optional[int] = None) -> float:
        s = int(self.state["step"]) if step is None else step
        return float(self._lr(jnp.asarray(s, jnp.float32)))

    # ---------------------------------------------------------- checkpointing
    def save(self, directory: str) -> str:
        """Write an orbax checkpoint at <directory>/step_<n>; returns path.
        All processes must call this (orbax coordinates multi-host saves)."""
        import orbax.checkpoint as ocp

        step = int(jax.device_get(self.state["step"]))
        path = os.path.join(os.path.abspath(directory), f"step_{step:08d}")
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, self.state, force=True)
        return path

    def restore(self, path: Optional[str] = None, directory: Optional[str] = None):
        """Restore from an explicit checkpoint path or the latest step_* in
        ``directory`` (no-op if none exist — fresh run)."""
        import orbax.checkpoint as ocp

        if path is None:
            assert directory is not None
            steps = sorted(
                d for d in (os.listdir(directory) if os.path.isdir(directory) else [])
                if d.startswith("step_"))
            if not steps:
                return False
            path = os.path.join(os.path.abspath(directory), steps[-1])
        ckptr = ocp.PyTreeCheckpointer()
        restore_args = jax.tree.map(
            lambda x, sh: ocp.type_handlers.ArrayRestoreArgs(
                sharding=sh, global_shape=x.shape, dtype=x.dtype),
            self.state, self.state_sh)
        self.state = ckptr.restore(
            path, item=self.state, restore_args=restore_args)
        return True
