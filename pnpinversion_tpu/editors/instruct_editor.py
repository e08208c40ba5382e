"""Instruction-conditioned editors: InstructPix2Pix and InstructDiffusion.

Parity:
- instruct-pix2pix (/root/reference/run_editing_instructpix2pix.py:33-46,93-135):
  8-channel UNet (latent + VAE image conditioning concat, unscaled .mode()),
  Euler-ancestral over k-diffusion sigmas, 3-way CFG
  ``uncond + sT(cond - img_cond) + sI(img_cond - uncond)``, sT=7.5, sI=1.5.
- instruct-diffusion (/root/reference/run_editing_instructdiffusion.py:32-49,90-130):
  same machinery, combination
  ``0.5(img_cond + txt_cond) + sT(cond - img_cond) + sI(cond - txt_cond)``,
  sT=5.0, sI=1.25.

Both consume the ``editing_instruction`` annotation instead of prompts and
emit strips [instruction | input | zeros | edit].
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.models.vae import latent_to_image, vae_encode
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.sampling.kdiffusion import (
    get_sigmas,
    sample_euler_ancestral,
    sigma_to_t,
)
from pnpinversion_tpu.utils.image import make_strip, txt_draw

Array = jax.Array


def instruct_sample(params, schedule, config, image_cond, text_cond, text_uncond,
                    steps, cfg_text, cfg_image, rng, variant: str):
    """image_cond: (1,h,w,4) UNSCALED VAE mode; variant: 'ip2p'|'instructdiff'."""
    sigmas = get_sigmas(schedule, steps)
    zeros_img = jnp.zeros_like(image_cond)

    if variant == "ip2p":
        ctx3 = jnp.concatenate([text_cond, text_uncond, text_uncond], axis=0)
        img3 = jnp.concatenate([image_cond, image_cond, zeros_img], axis=0)
    else:
        ctx3 = jnp.concatenate([text_cond, text_uncond, text_cond], axis=0)
        img3 = jnp.concatenate([image_cond, image_cond, zeros_img], axis=0)

    def denoise(x, sigma):
        c_in = 1.0 / (1.0 + sigma**2) ** 0.5
        t = sigma_to_t(schedule, sigma)
        x3 = jnp.concatenate([x * c_in] * 3, axis=0)
        x_in = jnp.concatenate([x3, img3], axis=-1)  # channel concat (NHWC)
        eps3, _ = unet_apply(params, x_in, t, ctx3, config)
        if variant == "ip2p":
            out_cond, out_img, out_unc = eps3[:1], eps3[1:2], eps3[2:]
            eps = out_unc + cfg_text * (out_cond - out_img) + cfg_image * (out_img - out_unc)
        else:
            out_cond, out_img, out_txt = eps3[:1], eps3[1:2], eps3[2:]
            eps = (0.5 * (out_img + out_txt) + cfg_text * (out_cond - out_img)
                   + cfg_image * (out_cond - out_txt))
        return x - sigma * eps

    k0, kloop = jax.random.split(rng)
    z = jax.random.normal(k0, image_cond.shape, image_cond.dtype) * sigmas[0]
    return sample_euler_ancestral(denoise, z, sigmas, kloop)


class InstructEditor:
    """edit_method in {'instruct-pix2pix', 'instruct-diffusion'}.

    The pipeline should carry an 8-in-channel UNet (configs.IP2P) with
    converted ip2p/InstructDiffusion checkpoints for real outputs.
    """

    def __init__(self, pipeline: SDPipeline):
        self.pipe = pipeline
        self._jit_cache: Dict = {}

    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def __call__(self, edit_method, image_path, editing_instruction,
                 steps=50, cfg_text=None, cfg_image=None, seed=1234) -> Image.Image:
        if edit_method == "instruct-pix2pix":
            variant, ct, ci = "ip2p", cfg_text or 7.5, cfg_image or 1.5
        elif edit_method == "instruct-diffusion":
            variant, ct, ci = "instructdiff", cfg_text or 5.0, cfg_image or 1.25
        else:
            raise NotImplementedError(f"No edit method named {edit_method}")
        return self.edit(image_path, editing_instruction, variant, steps, ct, ci, seed)

    def edit(self, image_path, instruction, variant, steps=50,
             cfg_text=7.5, cfg_image=1.5, seed=1234) -> Image.Image:
        pipe = self.pipe
        size = pipe.config.vae.sample_size
        if isinstance(image_path, str):
            img = Image.open(image_path).convert("RGB")
            img = img.resize((size, size), Image.Resampling.LANCZOS)
            image_np = np.array(img)
        else:
            image_np = np.asarray(image_path)

        enc = self._jit("enc", lambda: jax.jit(
            lambda p, im: vae_encode(
                p, (im.astype(pipe.dtype) / 127.5 - 1.0)[None],
                pipe.config.vae, scale=False)))
        dec = self._jit("dec", lambda: jax.jit(
            lambda p, z: latent_to_image(p, z, pipe.config.vae)))

        image_cond = enc(pipe.params["vae"], jnp.asarray(image_np))
        text_cond = pipe.encode_prompt([instruction])
        text_uncond = pipe.encode_prompt([""])

        fn = self._jit(("sample", variant, steps), lambda: jax.jit(
            lambda p, ic, tc, tu, ct, ci, r: instruct_sample(
                p, pipe.schedule, pipe.config.unet, ic, tc, tu, steps,
                ct, ci, r, variant)))
        z = fn(pipe.params["unet"], image_cond, text_cond, text_uncond,
               jnp.asarray(cfg_text, pipe.dtype), jnp.asarray(cfg_image, pipe.dtype),
               jax.random.PRNGKey(seed))
        edit = np.asarray(dec(pipe.params["vae"], z))[0]

        instruct_panel = txt_draw(f"edit prompt: {instruction}",
                                  target_size=(size, size))
        return make_strip([instruct_panel, image_np,
                           np.zeros_like(instruct_panel), edit])
