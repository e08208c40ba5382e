"""MasaCtrl editor (reference: /root/reference/run_editing_masactrl.py:58-168).

Methods:
- ddim+masactrl: guided DDIM inversion with an EMPTY prompt, then one batch-2
  sampling pass over ["", target] with mutual self-attention control; the
  source row of that same pass is the reconstruction panel (:131-168).
- directinversion+masactrl: DirectInversion offsets computed with prompts
  ["", target], applied to the source row during sampling (:89-129).

The reference also synthesizes an uncontrolled target image (image_fixed)
that never reaches the output strip (:104-109); we skip that dead pass.
Output strip: [instruction | source image | recon row | edit row].
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pnpinversion_tpu.control.masactrl import MasaCtrlControl, MasaCtrlSpec
from pnpinversion_tpu.data.pie_bench import load_image
from pnpinversion_tpu.inversion.ddim_inversion import (
    ddim_invert_loop,
    direct_inversion_offsets,
)
from pnpinversion_tpu.models.vae import image_to_latent, latent_to_image
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.sampling.p2p_forward import (
    fused_direct_inversion_edit,
    guidance_forward,
)
from pnpinversion_tpu.utils.image import make_strip, txt_draw


class MasaCtrlEditor:
    def __init__(self, pipeline: SDPipeline):
        self.pipe = pipeline
        self._jit_cache: Dict = {}

    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def __call__(self, edit_method, image_path, prompt_src, prompt_tar,
                 guidance_scale=7.5, step=4, layper=10) -> Image.Image:
        if edit_method == "ddim+masactrl":
            return self.edit_ddim(image_path, prompt_src, prompt_tar,
                                  guidance_scale, step, layper)
        if edit_method == "directinversion+masactrl":
            return self.edit_direct_inversion(image_path, prompt_src, prompt_tar,
                                              guidance_scale, step, layper)
        raise NotImplementedError(f"No edit method named {edit_method}")

    # ----------------------------------------------------------------- common
    def _sample(self, spec: MasaCtrlSpec):
        sched, ucfg = self.pipe.schedule, self.pipe.config.unet

        def build():
            control = MasaCtrlControl(spec)

            def fn(p, x_t, cond, uncond, g, noise_loss, row_mask):
                return guidance_forward(
                    p, sched, ucfg, x_t, cond, uncond, g, control, {},
                    noise_loss, row_mask)

            return jax.jit(fn)

        return self._jit(("masactrl", spec), build)

    def _sample_fused(self, spec: MasaCtrlSpec):
        """DirectInversion variant without the separate offset replay: the
        mutual-self-attention control never modifies the source row (target
        queries borrow source K,V; the source branch attends normally), so
        the sampling pass's own source row IS the offset replay — same
        algebra as sampling/p2p_forward.fused_direct_inversion_edit."""
        sched, ucfg = self.pipe.schedule, self.pipe.config.unet
        T = sched.num_steps

        def build():
            control = MasaCtrlControl(spec)

            def fn(p, traj, cond, uncond, g):
                row_mask = jnp.array([1.0, 0.0], cond.dtype)
                gate = jnp.ones((T,), cond.dtype)
                return fused_direct_inversion_edit(
                    p, sched, ucfg, traj, cond, uncond, g, control, {},
                    row_mask, gate)

            return jax.jit(fn)

        return self._jit(("masactrl_fused", spec), build)

    def _phases(self):
        sched, ucfg, vcfg = self.pipe.schedule, self.pipe.config.unet, self.pipe.config.vae
        enc = self._jit("enc", lambda: jax.jit(
            lambda p, img: image_to_latent(p, img, vcfg, dtype=self.pipe.dtype)))
        dec = self._jit("dec", lambda: jax.jit(
            lambda p, z: latent_to_image(p, z, vcfg)))
        inv = self._jit("inv", lambda: jax.jit(
            lambda p, lat, emb: ddim_invert_loop(p, sched, lat, emb, ucfg)))
        off = self._jit("off", lambda: jax.jit(
            lambda p, traj, ctx, g: direct_inversion_offsets(p, sched, traj, ctx, g, ucfg)))
        return enc, dec, inv, off

    def _strip(self, prompt_src, prompt_tar, image_gt, recon, edit) -> Image.Image:
        size = self.pipe.config.vae.sample_size
        instruct = txt_draw(
            f"source prompt: {prompt_src}\ntarget prompt: {prompt_tar}",
            target_size=(size, size))
        return make_strip([instruct, image_gt, recon, edit])

    # ---------------------------------------------------------------- methods
    def edit_ddim(self, image_path, prompt_src, prompt_tar, guidance_scale=7.5,
                  step=4, layper=10) -> Image.Image:
        pipe = self.pipe
        enc, dec, inv, _ = self._phases()
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        g = jnp.asarray(guidance_scale, pipe.dtype)

        latent = enc(pipe.params["vae"], jnp.asarray(image_gt))
        empty = pipe.encode_prompt([""])
        # guided inversion with prompt "": CFG of identical embeddings == the
        # plain embedding eps (diffuser_utils.py:195-270 with prompt "")
        traj = inv(pipe.params["unet"], latent, empty)
        x_t = traj[-1]

        cond = pipe.encode_prompt(["", prompt_tar])
        uncond = pipe.encode_prompt(["", ""])
        spec = MasaCtrlSpec(start_step=step, start_layer=layper)
        T = pipe.schedule.num_steps
        zeros = jnp.zeros((T, 2) + x_t.shape[1:], pipe.dtype)
        latents = self._sample(spec)(
            pipe.params["unet"], x_t, cond, uncond, g, zeros,
            jnp.zeros((2,), pipe.dtype))
        imgs = np.asarray(dec(pipe.params["vae"], latents))
        return self._strip(prompt_src, prompt_tar, image_gt, imgs[0], imgs[-1])

    def edit_direct_inversion(self, image_path, prompt_src, prompt_tar,
                              guidance_scale=7.5, step=4, layper=10) -> Image.Image:
        pipe = self.pipe
        enc, dec, inv, off = self._phases()
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        g = jnp.asarray(guidance_scale, pipe.dtype)

        latent = enc(pipe.params["vae"], jnp.asarray(image_gt))
        cond = pipe.encode_prompt(["", prompt_tar])
        uncond = pipe.encode_prompt(["", ""])
        # DirectInversion with prompts ["", tar]: ddim_loop keys on cond[0]=""
        traj = inv(pipe.params["unet"], latent, cond[:1])

        spec = MasaCtrlSpec(start_step=step, start_layer=layper)
        latents = self._sample_fused(spec)(
            pipe.params["unet"], traj, cond, uncond, g)
        imgs = np.asarray(dec(pipe.params["vae"], latents))
        return self._strip(prompt_src, prompt_tar, image_gt, imgs[0], imgs[-1])
