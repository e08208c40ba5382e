"""P2P-family editor: the TPU equivalent of the reference's ``P2PEditor``
(/root/reference/models/p2p_editor.py:12-978) with the same 30+ method-string
dispatch surface.

Each edit = (inversion phase) + (reconstruction scan) + (controlled edit scan),
all jitted once per method signature and reused across the benchmark sweep.
Outputs are the reference's 4-panel strips
[instruction | ground truth | reconstruction | edit].
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pnpinversion_tpu.control.base import NO_CONTROL
from pnpinversion_tpu.control.p2p import P2PControl, P2PSpec, make_p2p_control
from pnpinversion_tpu.data.pie_bench import load_image
from pnpinversion_tpu.inversion.ddim_inversion import (
    ddim_invert_loop,
    ddim_invert_loop_cfg,
    direct_inversion_offsets,
    make_step_gate,
    null_latent_offsets,
    null_text_optimization,
)
from pnpinversion_tpu.models.vae import image_to_latent, latent_to_image
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.sampling.p2p_forward import (
    guidance_forward,
    guidance_forward_single_branch,
    proximal_guidance_forward,
)
from pnpinversion_tpu.utils.image import make_strip, txt_draw
from pnpinversion_tpu.utils.text import slerp_tensor

Array = jax.Array

GUIDANCE_GRID = {"0": 0.0, "1": 1.0, "25": 2.5, "5": 5.0, "75": 7.5}


class P2PEditor:
    def __init__(self, pipeline: SDPipeline):
        self.pipe = pipeline
        self._jit_cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------------ jits
    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    @property
    def _encode_image(self):
        cfg = self.pipe.config.vae
        return self._jit("enc", lambda: jax.jit(
            lambda p, img: image_to_latent(p, img, cfg, dtype=self.pipe.dtype)))

    @property
    def _decode_image(self):
        cfg = self.pipe.config.vae
        return self._jit("dec", lambda: jax.jit(
            lambda p, z: latent_to_image(p, z, cfg)))

    @property
    def _invert(self):
        sched, ucfg = self.pipe.schedule, self.pipe.config.unet
        return self._jit("invert", lambda: jax.jit(
            lambda p, lat, emb: ddim_invert_loop(p, sched, lat, emb, ucfg)))

    @property
    def _invert_cfg(self):
        sched, ucfg = self.pipe.schedule, self.pipe.config.unet
        return self._jit("invert_cfg", lambda: jax.jit(
            lambda p, lat, u, c, g: ddim_invert_loop_cfg(p, sched, lat, u, c, g, ucfg)))

    @property
    def _offsets(self):
        sched, ucfg = self.pipe.schedule, self.pipe.config.unet
        return self._jit("offsets", lambda: jax.jit(
            lambda p, traj, ctx, g, gate: direct_inversion_offsets(
                p, sched, traj, ctx, g, ucfg, gate)))

    def _null_text(self, num_inner_steps: int):
        sched, ucfg = self.pipe.schedule, self.pipe.config.unet
        return self._jit(("nulltext", num_inner_steps), lambda: jax.jit(
            lambda p, traj, u, c, g: null_text_optimization(
                p, sched, traj, u, c, g, ucfg, num_inner_steps=num_inner_steps)))

    def _null_latent(self, num_inner_steps: int):
        sched, ucfg = self.pipe.schedule, self.pipe.config.unet
        return self._jit(("nulllat", num_inner_steps), lambda: jax.jit(
            lambda p, traj, ctx, g: null_latent_offsets(
                p, sched, traj, ctx, g, ucfg, num_inner_steps=num_inner_steps)))

    def _forward(self, spec: Optional[P2PSpec]):
        """Edit/recon scan, jitted per control spec (None => no control)."""
        sched, ucfg = self.pipe.schedule, self.pipe.config.unet

        def build():
            control = P2PControl(spec) if spec is not None else NO_CONTROL

            def fn(p, latent, cond, uncond, g, tensors, noise_loss, row_mask):
                return guidance_forward(
                    p, sched, ucfg, latent, cond, uncond, g,
                    control, tensors, noise_loss, row_mask,
                )

            return jax.jit(fn)

        return self._jit(("fwd", spec), build)

    def _fused_direct(self, spec: P2PSpec):
        """Source-free fused offsets+edit scan
        (sampling/p2p_forward.fused_direct_inversion_edit_srcfree): with full
        offsets the dead uncond-source row is dropped (2B-1 UNet rows)."""
        from pnpinversion_tpu.sampling.p2p_forward import (
            fused_direct_inversion_edit_srcfree,
        )

        sched, ucfg = self.pipe.schedule, self.pipe.config.unet
        fspec = dataclasses.replace(spec, uncond_rows=spec.batch_size - 1)

        def build():
            control = P2PControl(fspec)

            def fn(p, traj, cond, uncond, g, tensors):
                return fused_direct_inversion_edit_srcfree(
                    p, sched, ucfg, traj, cond, uncond, g, control, tensors)

            return jax.jit(fn)

        return self._jit(("fused", fspec), build)

    def _forward_single_branch(self, spec: Optional[P2PSpec]):
        sched, ucfg = self.pipe.schedule, self.pipe.config.unet

        def build():
            control = P2PControl(spec) if spec is not None else NO_CONTROL

            def fn(p, latent, cond, uncond_steps, uncond_static, g, tensors):
                return guidance_forward_single_branch(
                    p, sched, ucfg, latent, cond, uncond_steps, uncond_static, g,
                    control, tensors,
                )

            return jax.jit(fn)

        return self._jit(("fwd_sb", spec), build)

    def _forward_prox(self, spec: Optional[P2PSpec], edit_stage, prox, quantile,
                      recon_lr, recon_t, inversion_guidance, dilate_mask,
                      with_image_enc, with_x_stars):
        sched, ucfg = self.pipe.schedule, self.pipe.config.unet
        key = ("prox", spec, edit_stage, prox, quantile, recon_lr, recon_t,
               inversion_guidance, dilate_mask, with_image_enc, with_x_stars)

        def build():
            control = P2PControl(spec) if spec is not None else NO_CONTROL

            def fn(p, latent, cond, uncond, g, tensors, image_enc, x_stars):
                return proximal_guidance_forward(
                    p, sched, ucfg, latent, cond, uncond, g, control, tensors,
                    edit_stage=edit_stage, prox=prox, quantile=quantile,
                    image_enc=image_enc if with_image_enc else None,
                    recon_lr=recon_lr, recon_t=recon_t,
                    inversion_guidance=inversion_guidance,
                    x_stars=x_stars if with_x_stars else None,
                    dilate_mask=dilate_mask,
                )

            return jax.jit(fn)

        return self._jit(key, build)

    # ------------------------------------------------------------- utilities
    def _make_control(self, prompts, cross_replace_steps, self_replace_steps,
                      blend_word, eq_params, is_replace_controller):
        ctrl, tensors = make_p2p_control(
            prompts, self.pipe.tokenizer,
            num_steps=self.pipe.schedule.num_steps,
            cross_replace_steps=cross_replace_steps,
            self_replace_steps=self_replace_steps,
            is_replace_controller=is_replace_controller,
            blend_words=blend_word,
            eq_params=eq_params,
            num_lb_slots=self.pipe.num_lb_slots,
            lb_res=self.pipe.lb_res,
            latent_size=self.pipe.latent_size,
        )
        return ctrl.spec, tensors

    def _embeds(self, prompts):
        cond = self.pipe.encode_prompt(prompts)
        uncond = self.pipe.encode_prompt([""] * len(prompts))
        return cond, uncond

    def _zeros_loss(self, batch: int) -> Array:
        T = self.pipe.schedule.num_steps
        s = self.pipe.latent_size
        c = self.pipe.config.unet.in_channels
        return jnp.zeros((T, batch, s, s, c), dtype=self.pipe.dtype)

    def _strip(self, prompt_src, prompt_tar, image_gt, recon, edit) -> Image.Image:
        size = self.pipe.config.vae.sample_size
        instruct = txt_draw(
            f"source prompt: {prompt_src}\ntarget prompt: {prompt_tar}",
            target_size=(size, size),
        )
        return make_strip([instruct, image_gt, recon, edit])

    # ---------------------------------------------------------------- dispatch
    def __call__(
        self,
        edit_method: str,
        image_path,
        prompt_src: str,
        prompt_tar: str,
        guidance_scale: float = 7.5,
        proximal: Optional[str] = None,
        quantile: float = 0.7,
        use_reconstruction_guidance: bool = False,
        recon_t: int = 400,
        recon_lr: float = 0.1,
        cross_replace_steps: float = 0.4,
        self_replace_steps: float = 0.6,
        blend_word=None,
        eq_params=None,
        is_replace_controller: bool = False,
        use_inversion_guidance: bool = False,
        dilate_mask: int = 1,
        npi_interp: float = 0.0,
    ) -> Image.Image:
        kw = dict(
            guidance_scale=guidance_scale,
            cross_replace_steps=cross_replace_steps,
            self_replace_steps=self_replace_steps,
            blend_word=blend_word,
            eq_params=eq_params,
            is_replace_controller=is_replace_controller,
        )
        if edit_method == "ddim+p2p":
            return self.edit_ddim(image_path, prompt_src, prompt_tar, **kw)
        if edit_method in ("null-text-inversion+p2p", "null-text-inversion+p2p_a800",
                           "null-text-inversion+p2p_3090"):
            return self.edit_null_text(image_path, prompt_src, prompt_tar, **kw)
        if edit_method == "ablation_null-text-inversion_single_branch+p2p":
            return self.edit_null_text(image_path, prompt_src, prompt_tar,
                                       single_branch=True, **kw)
        if edit_method in ("negative-prompt-inversion+p2p",
                           "negative-prompt-inversion+proximal-guidance"):
            prox = proximal if edit_method.endswith("proximal-guidance") else None
            return self.edit_negative_prompt(
                image_path, prompt_src, prompt_tar, proximal=prox, quantile=quantile,
                use_reconstruction_guidance=use_reconstruction_guidance,
                recon_t=recon_t, recon_lr=recon_lr,
                use_inversion_guidance=use_inversion_guidance,
                dilate_mask=dilate_mask, npi_interp=npi_interp, **kw)
        if edit_method == "null-text-inversion+proximal-guidance":
            return self.edit_null_text_proximal(
                image_path, prompt_src, prompt_tar, proximal=proximal,
                quantile=quantile,
                use_reconstruction_guidance=use_reconstruction_guidance,
                recon_t=recon_t, recon_lr=recon_lr,
                use_inversion_guidance=use_inversion_guidance,
                dilate_mask=dilate_mask, **kw)
        if edit_method == "directinversion+p2p":
            return self.edit_direct_inversion(image_path, prompt_src, prompt_tar, **kw)
        if edit_method.startswith("directinversion+p2p_guidance_"):
            parts = edit_method.split("_")
            inv_g = GUIDANCE_GRID[parts[-2]]
            fwd_g = GUIDANCE_GRID[parts[-1]]
            return self.edit_direct_inversion(
                image_path, prompt_src, prompt_tar,
                inverse_guidance_scale=inv_g,
                **{**kw, "guidance_scale": fwd_g})
        if edit_method == "ablation_null-latent-inversion+p2p":
            return self.edit_null_latent(image_path, prompt_src, prompt_tar, **kw)
        if edit_method in ("ablation_directinversion_08+p2p", "ablation_directinversion_04+p2p"):
            scale = float(edit_method.split("+")[0].split("_")[-1]) / 10
            return self.edit_direct_inversion(image_path, prompt_src, prompt_tar,
                                              offset_scale=scale, **kw)
        if edit_method.startswith("ablation_directinversion_interval_"):
            skip = int(edit_method.split("+")[0].split("_")[-1])
            return self.edit_direct_inversion(image_path, prompt_src, prompt_tar,
                                              skip_step=skip, **kw)
        if edit_method == "ablation_directinversion_add-target+p2p":
            return self.edit_direct_inversion(image_path, prompt_src, prompt_tar,
                                              offset_rows="both", **kw)
        if edit_method == "ablation_directinversion_add-source+p2p":
            return self.edit_direct_inversion(image_path, prompt_src, prompt_tar,
                                              offset_rows="source_to_both", **kw)
        raise NotImplementedError(f"No edit method named {edit_method}")

    # ------------------------------------------------------------- methods
    def edit_direct_inversion(
        self, image_path, prompt_src, prompt_tar,
        guidance_scale=7.5, inverse_guidance_scale=None,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        blend_word=None, eq_params=None, is_replace_controller=False,
        offset_scale=1.0, skip_step=1, offset_rows="source",
        fast_recon=True, fused=True,
    ) -> Image.Image:
        """directinversion+p2p and its ablations
        (p2p_editor.py:415-543,707-978).

        fast_recon: with full offsets (scale 1, no skip) the reconstruction
        pass is mathematically the identity replay — its source row equals
        traj[0] by construction (the paper's exact-reconstruction property),
        so the recon panel is decode(traj[0]) and the 50 batch-4 UNet calls
        of the replay can be skipped (~30% of per-image compute). Set False
        to run the reference's explicit replay.
        """
        pipe = self.pipe
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        prompts = [prompt_src, prompt_tar]
        g = jnp.asarray(guidance_scale, pipe.dtype)

        latent = self._encode_image(pipe.params["vae"], jnp.asarray(image_gt))
        cond, uncond = self._embeds(prompts)

        if inverse_guidance_scale is None:
            traj = self._invert(pipe.params["unet"], latent, cond[:1])
        else:
            gi = jnp.asarray(inverse_guidance_scale, pipe.dtype)
            traj = self._invert_cfg(pipe.params["unet"], latent, uncond[:1], cond[:1], gi)

        gate = make_step_gate(pipe.schedule.num_steps, offset_scale, skip_step, pipe.dtype)
        spec, tensors = self._make_control(
            prompts, cross_replace_steps, self_replace_steps,
            blend_word, eq_params, is_replace_controller)

        use_fast_recon = fast_recon and offset_scale == 1.0 and skip_step == 1
        use_fused = fused and offset_rows == "source" and use_fast_recon

        if use_fused:
            # one batch-(2B-1) scan computes offsets AND the controlled edit
            edit_latents = self._fused_direct(spec)(
                pipe.params["unet"], traj, cond, uncond, g, tensors)
            # recon = decode(traj[0]) (exact-reconstruction shortcut); decode
            # both panels in one batched VAE call
            both = np.asarray(self._decode_image(
                pipe.params["vae"],
                jnp.concatenate([traj[0], edit_latents[-1:]], axis=0)))
            return self._strip(prompt_src, prompt_tar, image_gt, both[0], both[1])

        context = jnp.concatenate([uncond, cond], axis=0)
        noise_loss, _ = self._offsets(pipe.params["unet"], traj, context, g, gate)

        if offset_rows == "source":
            row_mask = jnp.array([1.0, 0.0], pipe.dtype)
        elif offset_rows == "both":
            row_mask = jnp.array([1.0, 1.0], pipe.dtype)
        else:  # 'source_to_both': source offsets applied to both rows (:930-933)
            noise_loss = jnp.broadcast_to(noise_loss[:, :1], noise_loss.shape)
            row_mask = jnp.array([1.0, 1.0], pipe.dtype)

        x_t = traj[-1]
        if use_fast_recon:
            recon = np.asarray(self._decode_image(pipe.params["vae"], traj[0]))[0]
        else:
            recon_latents = self._forward(None)(
                pipe.params["unet"], x_t, cond, uncond, g, None, noise_loss, row_mask)
            recon = np.asarray(self._decode_image(pipe.params["vae"], recon_latents[:1]))[0]

        edit_latents = self._forward(spec)(
            pipe.params["unet"], x_t, cond, uncond, g, tensors, noise_loss, row_mask)
        edit = np.asarray(self._decode_image(pipe.params["vae"], edit_latents[-1:]))[0]
        return self._strip(prompt_src, prompt_tar, image_gt, recon, edit)

    def edit_ddim(
        self, image_path, prompt_src, prompt_tar,
        guidance_scale=7.5, cross_replace_steps=0.4, self_replace_steps=0.6,
        blend_word=None, eq_params=None, is_replace_controller=False,
    ) -> Image.Image:
        """ddim+p2p (p2p_editor.py:137-198): plain DDIM inversion, standard
        "" uncond, no offsets."""
        pipe = self.pipe
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        prompts = [prompt_src, prompt_tar]
        g = jnp.asarray(guidance_scale, pipe.dtype)

        latent = self._encode_image(pipe.params["vae"], jnp.asarray(image_gt))
        cond, uncond = self._embeds(prompts)
        traj = self._invert(pipe.params["unet"], latent, cond[:1])
        x_t = traj[-1]

        recon_latents = self._forward(None)(
            pipe.params["unet"], x_t, cond[:1], uncond[:1], g, None,
            self._zeros_loss(1), jnp.zeros((1,), pipe.dtype))
        recon = np.asarray(self._decode_image(pipe.params["vae"], recon_latents))[0]

        spec, tensors = self._make_control(
            prompts, cross_replace_steps, self_replace_steps,
            blend_word, eq_params, is_replace_controller)
        edit_latents = self._forward(spec)(
            pipe.params["unet"], x_t, cond, uncond, g, tensors,
            self._zeros_loss(2), jnp.zeros((2,), pipe.dtype))
        edit = np.asarray(self._decode_image(pipe.params["vae"], edit_latents[-1:]))[0]
        return self._strip(prompt_src, prompt_tar, image_gt, recon, edit)

    def edit_null_text(
        self, image_path, prompt_src, prompt_tar,
        guidance_scale=7.5, cross_replace_steps=0.4, self_replace_steps=0.6,
        blend_word=None, eq_params=None, is_replace_controller=False,
        num_inner_steps=10, single_branch=False,
    ) -> Image.Image:
        """null-text-inversion+p2p (p2p_editor.py:199-323)."""
        pipe = self.pipe
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        prompts = [prompt_src, prompt_tar]
        g = jnp.asarray(guidance_scale, pipe.dtype)

        latent = self._encode_image(pipe.params["vae"], jnp.asarray(image_gt))
        cond, uncond = self._embeds(prompts)
        traj = self._invert(pipe.params["unet"], latent, cond[:1])
        uncond_steps = self._null_text(num_inner_steps)(
            pipe.params["unet"], traj, uncond[:1], cond[:1], g)
        x_t = traj[-1]

        fwd = self._forward_single_branch if single_branch else self._forward
        if single_branch:
            recon_latents = fwd(None)(
                pipe.params["unet"], x_t, cond[:1], uncond_steps, uncond[:1], g, None)
        else:
            recon_latents = fwd(None)(
                pipe.params["unet"], x_t, cond[:1], uncond_steps, g, None,
                self._zeros_loss(1), jnp.zeros((1,), pipe.dtype))
        recon = np.asarray(self._decode_image(pipe.params["vae"], recon_latents))[0]

        spec, tensors = self._make_control(
            prompts, cross_replace_steps, self_replace_steps,
            blend_word, eq_params, is_replace_controller)
        if single_branch:
            edit_latents = fwd(spec)(
                pipe.params["unet"], x_t, cond, uncond_steps, uncond, g, tensors)
        else:
            edit_latents = fwd(spec)(
                pipe.params["unet"], x_t, cond, uncond_steps, g, tensors,
                self._zeros_loss(2), jnp.zeros((2,), pipe.dtype))
        edit = np.asarray(self._decode_image(pipe.params["vae"], edit_latents[-1:]))[0]
        return self._strip(prompt_src, prompt_tar, image_gt, recon, edit)

    def edit_negative_prompt(
        self, image_path, prompt_src, prompt_tar,
        guidance_scale=7.5, proximal=None, quantile=0.7,
        use_reconstruction_guidance=False, recon_t=400, recon_lr=0.1,
        npi_interp=0.0, cross_replace_steps=0.4, self_replace_steps=0.6,
        blend_word=None, eq_params=None, is_replace_controller=False,
        use_inversion_guidance=False, dilate_mask=1,
    ) -> Image.Image:
        """negative-prompt-inversion(+proximal) (p2p_editor.py:324-414):
        inversion is plain DDIM; the "uncond" embedding is the cond embedding
        (optionally slerped toward the real uncond)."""
        pipe = self.pipe
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        prompts = [prompt_src, prompt_tar]
        g = jnp.asarray(guidance_scale, pipe.dtype)

        latent = self._encode_image(pipe.params["vae"], jnp.asarray(image_gt))
        cond, uncond = self._embeds(prompts)
        traj = self._invert(pipe.params["unet"], latent, cond[:1])
        x_t = traj[-1]

        fake_uncond = cond[:1]
        if npi_interp > 0.0:
            fake_uncond = jnp.asarray(slerp_tensor(
                npi_interp, np.asarray(cond[:1], np.float32),
                np.asarray(uncond[:1], np.float32))).astype(pipe.dtype)

        recon_latents = self._forward_prox(
            None, False, None, quantile, recon_lr, recon_t, False, dilate_mask,
            False, False)(
            pipe.params["unet"], x_t, cond[:1], fake_uncond, g, None, latent, traj)
        recon = np.asarray(self._decode_image(pipe.params["vae"], recon_latents))[0]

        spec, tensors = self._make_control(
            prompts, cross_replace_steps, self_replace_steps,
            blend_word, eq_params, is_replace_controller)
        eff_recon_lr = recon_lr if (use_reconstruction_guidance or use_inversion_guidance) else 0.0
        eff_recon_t = recon_t if (use_reconstruction_guidance or use_inversion_guidance) else 1000
        edit_latents = self._forward_prox(
            spec, True, proximal, quantile, eff_recon_lr, eff_recon_t,
            use_inversion_guidance, dilate_mask,
            use_reconstruction_guidance, True)(
            pipe.params["unet"], x_t, cond,
            jnp.broadcast_to(fake_uncond, cond.shape), g, tensors, latent, traj)
        edit = np.asarray(self._decode_image(pipe.params["vae"], edit_latents[-1:]))[0]
        return self._strip(prompt_src, prompt_tar, image_gt, recon, edit)

    def edit_null_text_proximal(
        self, image_path, prompt_src, prompt_tar,
        guidance_scale=7.5, proximal=None, quantile=0.7,
        use_reconstruction_guidance=False, recon_t=400, recon_lr=0.1,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        blend_word=None, eq_params=None, is_replace_controller=False,
        use_inversion_guidance=False, dilate_mask=1, num_inner_steps=10,
    ) -> Image.Image:
        """null-text-inversion+proximal-guidance (p2p_editor.py:550-639)."""
        pipe = self.pipe
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        prompts = [prompt_src, prompt_tar]
        g = jnp.asarray(guidance_scale, pipe.dtype)

        latent = self._encode_image(pipe.params["vae"], jnp.asarray(image_gt))
        cond, uncond = self._embeds(prompts)
        traj = self._invert(pipe.params["unet"], latent, cond[:1])
        uncond_steps = self._null_text(num_inner_steps)(
            pipe.params["unet"], traj, uncond[:1], cond[:1], g)
        x_t = traj[-1]

        recon_latents = self._forward_prox(
            None, False, None, quantile, recon_lr, recon_t, False, dilate_mask,
            False, False)(
            pipe.params["unet"], x_t, cond[:1], uncond_steps, g, None, latent, traj)
        recon = np.asarray(self._decode_image(pipe.params["vae"], recon_latents))[0]

        spec, tensors = self._make_control(
            prompts, cross_replace_steps, self_replace_steps,
            blend_word, eq_params, is_replace_controller)
        eff_recon_lr = recon_lr if (use_reconstruction_guidance or use_inversion_guidance) else 0.0
        eff_recon_t = recon_t if (use_reconstruction_guidance or use_inversion_guidance) else 1000
        edit_latents = self._forward_prox(
            spec, True, proximal, quantile, eff_recon_lr, eff_recon_t,
            use_inversion_guidance, dilate_mask,
            use_reconstruction_guidance, True)(
            pipe.params["unet"], x_t, cond, uncond_steps, g, tensors, latent, traj)
        edit = np.asarray(self._decode_image(pipe.params["vae"], edit_latents[-1:]))[0]
        return self._strip(prompt_src, prompt_tar, image_gt, recon, edit)

    def edit_null_latent(
        self, image_path, prompt_src, prompt_tar,
        guidance_scale=7.5, cross_replace_steps=0.4, self_replace_steps=0.6,
        blend_word=None, eq_params=None, is_replace_controller=False,
        num_inner_steps=10,
    ) -> Image.Image:
        """ablation_null-latent-inversion+p2p (p2p_editor.py:640-706)."""
        pipe = self.pipe
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        prompts = [prompt_src, prompt_tar]
        g = jnp.asarray(guidance_scale, pipe.dtype)

        latent = self._encode_image(pipe.params["vae"], jnp.asarray(image_gt))
        cond, uncond = self._embeds(prompts)
        traj = self._invert(pipe.params["unet"], latent, cond[:1])
        context = jnp.concatenate([uncond, cond], axis=0)
        noise_loss = self._null_latent(num_inner_steps)(
            pipe.params["unet"], traj, context, g)
        x_t = traj[-1]
        row_mask = jnp.array([1.0, 0.0], pipe.dtype)

        recon_latents = self._forward(None)(
            pipe.params["unet"], x_t, cond, uncond, g, None, noise_loss, row_mask)
        recon = np.asarray(self._decode_image(pipe.params["vae"], recon_latents[:1]))[0]

        spec, tensors = self._make_control(
            prompts, cross_replace_steps, self_replace_steps,
            blend_word, eq_params, is_replace_controller)
        edit_latents = self._forward(spec)(
            pipe.params["unet"], x_t, cond, uncond, g, tensors, noise_loss, row_mask)
        edit = np.asarray(self._decode_image(pipe.params["vae"], edit_latents[-1:]))[0]
        return self._strip(prompt_src, prompt_tar, image_gt, recon, edit)
