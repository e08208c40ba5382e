"""Edit-friendly DDPM editor
(reference: /root/reference/run_editing_edit_friendly_p2p.py:64-133).

edit-friendly-inversion+p2p: extract noise maps with the source prompt
(eta=1, source cfg=1), then a controlled batch-2 reverse pass from
wts[T-skip] with the stored zs; Replace when the prompts have equal word
counts, else Refine. The reference also runs a batch-1 reconstruction pass
whose decode never reaches the output strip (:88,104-106) — skipped here.
Output strip: [instruction | gt | edit-pass source row | edit-pass target row].
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pnpinversion_tpu.control.p2p import make_p2p_control
from pnpinversion_tpu.control.p2p import P2PControl
from pnpinversion_tpu.data.pie_bench import load_image
from pnpinversion_tpu.inversion.ef_ddpm import ef_forward_process, ef_reverse_process
from pnpinversion_tpu.models.vae import image_to_latent, latent_to_image
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.schedulers.ddim import make_ddim_schedule
from pnpinversion_tpu.utils.image import make_strip, txt_draw


class EditFriendlyEditor:
    def __init__(self, pipeline: SDPipeline, steps_offset: int = 1):
        self.pipe = pipeline
        # DDIMScheduler.from_config("CompVis/stable-diffusion-v1-4"): steps_offset=1
        self.schedule = make_ddim_schedule(
            num_steps=pipeline.schedule.num_steps, steps_offset=steps_offset)
        self._jit_cache: Dict = {}

    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def __call__(self, edit_method, image_path, prompt_src, prompt_tar,
                 source_guidance_scale=1.0, target_guidance_scale=7.5,
                 cross_replace_steps=0.4, self_replace_steps=0.6,
                 eta=1.0, skip=12, seed=1234) -> Image.Image:
        if edit_method != "edit-friendly-inversion+p2p":
            raise NotImplementedError(f"No edit method named {edit_method}")
        return self.edit(image_path, prompt_src, prompt_tar,
                         source_guidance_scale, target_guidance_scale,
                         cross_replace_steps, self_replace_steps, eta, skip, seed)

    def _forward_fn(self, eta: float):
        sched, ucfg = self.schedule, self.pipe.config.unet
        return self._jit(("ef_fwd", eta), lambda: jax.jit(
            lambda p, x0, c, u, g, rng: ef_forward_process(
                p, sched, x0, c, u, g, ucfg, rng, eta=eta)))

    def _reverse_fn(self, spec, eta: float, num_zs: int):
        sched, ucfg = self.schedule, self.pipe.config.unet

        def build():
            control = P2PControl(spec) if spec is not None else None

            def fn(p, xT, zs, cond, uncond, scales, tensors):
                from pnpinversion_tpu.control.base import NO_CONTROL

                return ef_reverse_process(
                    p, sched, xT, zs, cond, uncond, scales, ucfg, eta=eta,
                    control=control if control is not None else NO_CONTROL,
                    tensors=tensors, num_zs=num_zs)

            return jax.jit(fn)

        return self._jit(("ef_rev", spec, eta, num_zs), build)

    def edit(self, image_path, prompt_src, prompt_tar,
             source_guidance_scale=1.0, target_guidance_scale=7.5,
             cross_replace_steps=0.4, self_replace_steps=0.6,
             eta=1.0, skip=12, seed=1234) -> Image.Image:
        pipe = self.pipe
        T = self.schedule.num_steps
        image_gt = load_image(image_path, pipe.config.vae.sample_size)

        enc = self._jit("enc", lambda: jax.jit(
            lambda p, img: image_to_latent(p, img, pipe.config.vae, dtype=pipe.dtype)))
        dec = self._jit("dec", lambda: jax.jit(
            lambda p, z: latent_to_image(p, z, pipe.config.vae)))

        x0 = enc(pipe.params["vae"], jnp.asarray(image_gt))
        cond_src = pipe.encode_prompt([prompt_src])
        uncond1 = pipe.encode_prompt([""])
        rng = jax.random.PRNGKey(seed)
        zs, xts = self._forward_fn(eta)(
            pipe.params["unet"], x0, cond_src, uncond1,
            jnp.asarray(source_guidance_scale, pipe.dtype), rng)

        prompts = [prompt_src, prompt_tar]
        is_replace = len(prompt_src.split(" ")) == len(prompt_tar.split(" "))
        ctrl, tensors = make_p2p_control(
            prompts, pipe.tokenizer, num_steps=T,
            cross_replace_steps=cross_replace_steps,
            self_replace_steps=self_replace_steps,
            is_replace_controller=is_replace,
            num_lb_slots=pipe.num_lb_slots, lb_res=pipe.lb_res,
            latent_size=pipe.latent_size,
            # EF's controller copy replaces self-attn only at <=16^2
            # (ptp_classes.py:106), unlike P2P's 32^2
            self_edit_max_seq=16 * 16)

        cond = pipe.encode_prompt(prompts)
        uncond = pipe.encode_prompt(["", ""])
        scales = jnp.asarray([source_guidance_scale, target_guidance_scale], pipe.dtype)
        Z = T - skip
        w = self._reverse_fn(ctrl.spec, eta, Z)(
            pipe.params["unet"], xts[T - skip], zs[:Z], cond, uncond, scales, tensors)
        imgs = np.asarray(dec(pipe.params["vae"], w))

        size = pipe.config.vae.sample_size
        instruct = txt_draw(
            f"source prompt: {prompt_src}\ntarget prompt: {prompt_tar}",
            target_size=(size, size))
        # strip: [instruct, gt, source-row recon, target-row edit] (:104-131)
        return make_strip([instruct, image_gt, imgs[0], imgs[1]])
