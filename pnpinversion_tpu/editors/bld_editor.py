"""Blended Latent Diffusion editor
(reference: /root/reference/run_editing_blended_latent_diffusion.py:40-173).

SD2.1-base; start from pure noise, denoise with the target prompt over the
last (1 - blending_percentage) of the schedule, and after every step re-blend
the background from a freshly-noised source latent using the PIE ground-truth
mask downsampled to latent resolution (nearest). The only benchmark method
that consumes the mask annotation at edit time. Output strip:
[instruction | original | zeros | edit] (:146 — the reference emits a zero
reconstruction panel).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.models.vae import image_to_latent, latent_to_image
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.schedulers.ddim import (
    add_noise,
    classifier_free_guidance,
    ddim_step,
)
from pnpinversion_tpu.utils.image import make_strip, txt_draw

Array = jax.Array


def bld_sample(params, schedule, config, source_latents, latent_mask, text_ctx,
               guidance_scale, rng, blending_percentage: float = 0.25):
    """text_ctx: (2, 77, D) [uncond, cond]; latent_mask: (h, w, 1) {0,1}."""
    T = schedule.num_steps
    start = int(T * blending_percentage)
    n = T - start
    k0, kloop = jax.random.split(rng)
    latents = jax.random.normal(k0, source_latents.shape, source_latents.dtype)

    def body(carry, i):
        lat, key = carry
        key, kn = jax.random.split(key)
        t = schedule.timesteps[start + i]
        x_in = jnp.concatenate([lat, lat], axis=0)
        eps2, _ = unet_apply(params, x_in, t, text_ctx, config)
        eps = classifier_free_guidance(eps2[:1], eps2[1:], guidance_scale)
        lat = ddim_step(schedule, eps, t, lat)
        noise = jax.random.normal(kn, lat.shape, lat.dtype)
        noised_src = add_noise(schedule, source_latents, noise, t)
        lat = lat * latent_mask + noised_src * (1.0 - latent_mask)
        return (lat, key), ()

    (latents, _), _ = jax.lax.scan(body, (latents, kloop), jnp.arange(n))
    return latents


class BlendedLatentDiffusionEditor:
    def __init__(self, pipeline: SDPipeline):
        self.pipe = pipeline
        self._jit_cache: Dict = {}

    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def __call__(self, edit_method, image_path, mask, prompt_tar,
                 guidance_scale=7.5, blending_percentage=0.25,
                 seed: int = 42) -> Image.Image:
        if edit_method != "blended-latent-diffusion":
            raise NotImplementedError(f"No edit method named {edit_method}")
        return self.edit(image_path, mask, prompt_tar, guidance_scale,
                         blending_percentage, seed)

    def edit(self, image_path, mask, prompt_tar, guidance_scale=7.5,
             blending_percentage=0.25, seed: int = 42) -> Image.Image:
        pipe = self.pipe
        size = pipe.config.vae.sample_size
        lat_size = pipe.latent_size
        if isinstance(image_path, str):
            img = Image.open(image_path).resize((size, size), Image.BILINEAR)
            image_ori = np.array(img)[:, :, :3]
        else:
            image_ori = np.asarray(image_path)[:, :, :3]

        mask = np.asarray(mask, dtype=np.float32)
        if mask.ndim == 3:
            mask = mask[:, :, 0]
        mask_img = Image.fromarray(mask.astype(np.uint8)).resize(
            (lat_size, lat_size), Image.NEAREST)
        latent_mask = (np.array(mask_img) >= 0.5).astype(np.float32)[..., None]

        enc = self._jit("enc", lambda: jax.jit(
            lambda p, img: image_to_latent(p, img, pipe.config.vae, dtype=pipe.dtype)))
        dec = self._jit("dec", lambda: jax.jit(
            lambda p, z: latent_to_image(p, z, pipe.config.vae)))
        source_latents = enc(pipe.params["vae"], jnp.asarray(image_ori))

        ctx = jnp.concatenate(
            [pipe.encode_prompt([""]), pipe.encode_prompt([prompt_tar])], axis=0)
        fn = self._jit(("bld", blending_percentage), lambda: jax.jit(
            lambda p, sl, m, c, g, r: bld_sample(
                p, pipe.schedule, pipe.config.unet, sl, m, c, g, r,
                blending_percentage)))
        latents = fn(pipe.params["unet"], source_latents,
                     jnp.asarray(latent_mask, pipe.dtype), ctx,
                     jnp.asarray(guidance_scale, pipe.dtype),
                     jax.random.PRNGKey(seed))
        edit = np.asarray(dec(pipe.params["vae"], latents))[0]

        instruct = txt_draw(f"edit prompt: {prompt_tar}", target_size=(size, size))
        return make_strip([instruct, image_ori, np.zeros_like(instruct), edit])
