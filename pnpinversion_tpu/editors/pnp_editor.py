"""Plug-and-Play editor (reference: /root/reference/run_editing_pnp.py).

Methods:
- ddim+pnp (:414-437): invert, re-denoise to get the reconstruction
  trajectory, then sample with feature/attention injection where the
  source branch is fed the RE-DENOISED latents.
- directinversion+pnp (:440-462): the source branch is fed the exact
  INVERSION latents at each step (the offset trick's degenerate form here).

The reference's PnP stack runs SD1.5 whose scheduler config has
steps_offset=1, so this editor's schedule uses timesteps [981,...,1].
Negative prompt "ugly, blurry, black, low res, unrealistic" (:383).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pnpinversion_tpu.control.pnp import PnPControl, PnPSpec, make_pnp_control
from pnpinversion_tpu.data.pie_bench import load_image
from pnpinversion_tpu.inversion.ddim_inversion import ddim_invert_loop
from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.models.vae import image_to_latent, latent_to_image
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.schedulers.ddim import (
    classifier_free_guidance,
    ddim_step,
    make_ddim_schedule,
)
from pnpinversion_tpu.utils.image import make_strip, txt_draw

Array = jax.Array

NEGATIVE_PROMPT = "ugly, blurry, black, low res, unrealistic"


def ddim_sample_trajectory(params, schedule, config, x, embedding):
    """Plain single-embedding DDIM sampling, returning all T outputs
    (Preprocess.ddim_sample, run_editing_pnp.py:118-141)."""

    def body(lat, i):
        t = schedule.timesteps[i]
        eps, _ = unet_apply(params, lat, t, embedding, config)
        nxt = ddim_step(schedule, eps, t, lat)
        return nxt, nxt

    _, traj = jax.lax.scan(body, x, jnp.arange(schedule.num_steps))
    return traj  # (T, 1, h, w, c)


def pnp_sample_loop(params, schedule, config, control: PnPControl,
                    source_latents, x0, embeds, guidance_scale):
    """Batch-3 injection sampling (run_editing_pnp.py:350-369,393-399).

    embeds: (3, 77, D) = [source "" embedding, negative-prompt embedding,
    target embedding]; source_latents: (T, 1, h, w, c) fed to row 0.
    """

    def body(x, i):
        t = schedule.timesteps[i]
        x_in = jnp.concatenate([source_latents[i], x, x], axis=0)
        eps3, _ = unet_apply(params, x_in, t, embeds, config, control, {}, {}, step=i)
        eps = classifier_free_guidance(eps3[1:2], eps3[2:3], guidance_scale)
        x = ddim_step(schedule, eps, t, x)
        return x, ()

    x, _ = jax.lax.scan(body, x0, jnp.arange(schedule.num_steps))
    return x


class PnPEditor:
    def __init__(self, pipeline: SDPipeline, steps_offset: int = 1):
        self.pipe = pipeline
        # SD1.5's scheduler config: steps_offset=1
        self.schedule = make_ddim_schedule(
            num_steps=pipeline.schedule.num_steps, steps_offset=steps_offset)
        self._jit_cache: Dict = {}

    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def __call__(self, edit_method, image_path, prompt_src, prompt_tar,
                 guidance_scale=7.5) -> Image.Image:
        if edit_method == "ddim+pnp":
            return self.edit_ddim(image_path, prompt_src, prompt_tar, guidance_scale)
        if edit_method == "directinversion+pnp":
            return self.edit_direct_inversion(image_path, prompt_src, prompt_tar,
                                              guidance_scale)
        raise NotImplementedError(f"No edit method named {edit_method}")

    def _phases(self):
        pipe, sched, ucfg, vcfg = self.pipe, self.schedule, self.pipe.config.unet, self.pipe.config.vae
        enc = self._jit("enc", lambda: jax.jit(
            lambda p, img: image_to_latent(p, img, vcfg, dtype=pipe.dtype)))
        dec = self._jit("dec", lambda: jax.jit(
            lambda p, z: latent_to_image(p, z, vcfg)))
        inv = self._jit("inv", lambda: jax.jit(
            lambda p, lat, emb: ddim_invert_loop(p, sched, lat, emb, ucfg)))
        smp = self._jit("smp", lambda: jax.jit(
            lambda p, x, emb: ddim_sample_trajectory(p, sched, ucfg, x, emb)))
        return enc, dec, inv, smp

    def _pnp_forward(self, spec: PnPSpec):
        sched, ucfg = self.schedule, self.pipe.config.unet

        def build():
            control = PnPControl(spec)

            def fn(p, src_lat, x0, embeds, g):
                return pnp_sample_loop(p, sched, ucfg, control, src_lat, x0, embeds, g)

            return jax.jit(fn)

        return self._jit(("pnp", spec), build)

    def _embeds(self, prompt_tar):
        e = self.pipe.encode_prompt(["", NEGATIVE_PROMPT, prompt_tar])
        return e  # rows: source "", negative, target

    def _strip(self, prompt_src, prompt_tar, image_gt, recon, edit):
        size = self.pipe.config.vae.sample_size
        instruct = txt_draw(
            f"source prompt: {prompt_src}\ntarget prompt: {prompt_tar}",
            target_size=(size, size))
        return make_strip([instruct, image_gt, recon, edit])

    def edit_ddim(self, image_path, prompt_src, prompt_tar, guidance_scale=7.5):
        pipe = self.pipe
        enc, dec, inv, smp = self._phases()
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        g = jnp.asarray(guidance_scale, pipe.dtype)

        latent = enc(pipe.params["vae"], jnp.asarray(image_gt))
        cond_src = pipe.encode_prompt([prompt_src])
        traj = inv(pipe.params["unet"], latent, cond_src)
        recon_traj = smp(pipe.params["unet"], traj[-1], cond_src)  # (T,1,...)
        recon = np.asarray(dec(pipe.params["vae"], recon_traj[-1]))[0]

        control = make_pnp_control(pipe.config.unet, self.schedule.num_steps)
        embeds = self._embeds(prompt_tar)
        edited = self._pnp_forward(control.spec)(
            pipe.params["unet"], recon_traj, recon_traj[0], embeds, g)
        edit = np.asarray(dec(pipe.params["vae"], edited))[0]
        return self._strip(prompt_src, prompt_tar, image_gt, recon, edit)

    def edit_direct_inversion(self, image_path, prompt_src, prompt_tar,
                              guidance_scale=7.5):
        pipe = self.pipe
        enc, dec, inv, _ = self._phases()
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        g = jnp.asarray(guidance_scale, pipe.dtype)

        latent = enc(pipe.params["vae"], jnp.asarray(image_gt))
        cond_src = pipe.encode_prompt([prompt_src])
        traj = inv(pipe.params["unet"], latent, cond_src)  # (T+1, 1, ...)
        # source branch gets the exact inversion latent at the current level
        # (run_editing_pnp.py:353 cat of noisy_latent[-1-i])
        source_latents = traj[::-1][:-1]  # [x_T, x_{T-1}, ..., x_1]
        recon = np.asarray(dec(pipe.params["vae"], traj[1]))[0]

        control = make_pnp_control(pipe.config.unet, self.schedule.num_steps)
        embeds = self._embeds(prompt_tar)
        edited = self._pnp_forward(control.spec)(
            pipe.params["unet"], source_latents, traj[-1], embeds, g)
        edit = np.asarray(dec(pipe.params["vae"], edited))[0]
        return self._strip(prompt_src, prompt_tar, image_gt, recon, edit)
