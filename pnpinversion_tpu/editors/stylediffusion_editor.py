"""StyleDiffusion editor (reference: /root/reference/run_editing_stylediffusion.py).

stylediffusion+p2p: VaeInversion trains per-step mapping networks that turn
CLIP image tokens into a learned prompt-value embedding; editing then runs
two batch-2 passes (recon with v_replace=1.0 + AttentionStore, edit with the
tau-parameterized P2P controller; taus v=.5, c=.6, s=.6, u=.0, :252-255).
Replace-vs-Refine is the reference's char-length rule (:181, see
``stylediffusion_is_replace``). Output strip:
[instruction | gt | recon pass row 0 | edit pass row 1].
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pnpinversion_tpu.control.p2p import make_p2p_control
from pnpinversion_tpu.control.stylediffusion import (
    StyleDiffusionControl,
    StyleDiffusionSpec,
)
from pnpinversion_tpu.data.pie_bench import load_image
from pnpinversion_tpu.evaluation.metrics import center_crop_resize_224, clip_normalize
from pnpinversion_tpu.inversion.stylediffusion import (
    ddim_invert_with_maps,
    train_mappers,
)
from pnpinversion_tpu.models import vit
from pnpinversion_tpu.models.stylediffusion import init_mapper_params, mapper_at_step
from pnpinversion_tpu.models.vae import image_to_latent, latent_to_image
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.sampling.p2p_forward import guidance_forward
from pnpinversion_tpu.utils.image import make_strip, txt_draw

CLIP_VIT_B16 = vit.ViTConfig(image_size=224, patch_size=16, width=768, layers=12,
                             heads=12, projection_dim=512)


def stylediffusion_is_replace(prompt_src: str, prompt_tar: str) -> bool:
    """The reference's Replace-vs-Refine rule for stylediffusion+p2p.

    run_editing_stylediffusion.py:181 ignores the runner's
    is_replace_controller=False argument and selects AttentionReplace when
    ``len(prompt_src.strip(" ")) == len(prompt_tar.strip(" "))`` — CHARACTER
    length equality of the space-stripped prompts, not word count.

    When that rule fires but the word counts differ, the reference's
    get_replacement_mapper_ raises (seq_aligner requires equal word counts)
    and its sweep process dies on that image; behavior there is undefined,
    so we degrade to Refine — the only controller that can run.
    """
    if len(prompt_src.strip(" ")) != len(prompt_tar.strip(" ")):
        return False
    return len(prompt_src.split(" ")) == len(prompt_tar.split(" "))


class StyleDiffusionEditor:
    def __init__(self, pipeline: SDPipeline, clip_vision_params=None,
                 clip_vision_cfg: vit.ViTConfig = CLIP_VIT_B16,
                 rng: Optional[jax.Array] = None):
        self.pipe = pipeline
        self.clip_cfg = clip_vision_cfg
        rng = rng if rng is not None else jax.random.PRNGKey(42)
        self.clip_params = (clip_vision_params if clip_vision_params is not None
                            else vit.init_vit_params(rng, clip_vision_cfg))
        self._jit_cache: Dict = {}

    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def __call__(self, edit_method, image_path, prompt_src, prompt_tar,
                 guidance_scale=7.5, **kw) -> Image.Image:
        if edit_method != "stylediffusion+p2p":
            raise NotImplementedError(f"No edit method named {edit_method}")
        return self.edit(image_path, prompt_src, prompt_tar, guidance_scale, **kw)

    def _img_tokens(self, image_gt: np.ndarray):
        def fn(p, img_u8):
            x = img_u8.astype(jnp.float32) / 255.0
            x = center_crop_resize_224(x, self.clip_cfg.image_size)
            x = clip_normalize(x)
            tokens, _ = vit.vit_apply(p, x[None], self.clip_cfg, return_tokens=True)
            return tokens

        return self._jit("clip_tokens", lambda: jax.jit(fn))(
            self.clip_params, jnp.asarray(image_gt))

    def edit(self, image_path, prompt_src, prompt_tar, guidance_scale=7.5,
             cross_replace_steps=None, self_replace_steps=None,
             blend_word=None, eq_params=None, is_replace_controller=None,
             num_inner_steps=100, tau_v=0.5, tau_c=0.6, tau_s=0.6, tau_u=0.0,
             ) -> Image.Image:
        pipe = self.pipe
        T = pipe.schedule.num_steps
        image_gt = load_image(image_path, pipe.config.vae.sample_size)
        g = jnp.asarray(guidance_scale, pipe.dtype)

        enc = self._jit("enc", lambda: jax.jit(
            lambda p, img: image_to_latent(p, img, pipe.config.vae, dtype=pipe.dtype)))
        dec = self._jit("dec", lambda: jax.jit(
            lambda p, z: latent_to_image(p, z, pipe.config.vae)))

        latent = enc(pipe.params["vae"], jnp.asarray(image_gt))
        cond_src = pipe.encode_prompt([prompt_src])
        uncond1 = pipe.encode_prompt([""])
        img_tokens = self._img_tokens(image_gt)

        # 1) inversion with supervision maps
        inv = self._jit("inv", lambda: jax.jit(
            lambda p, lat, emb: ddim_invert_with_maps(
                p, pipe.schedule, lat, emb, pipe.config.unet, pipe.num_lb_slots)))
        traj, gt_maps = inv(pipe.params["unet"], latent, cond_src)

        # 2) per-step mapper training
        n_tokens = (self.clip_cfg.image_size // self.clip_cfg.patch_size) ** 2 + 1
        mapper0 = mapper_at_step(
            init_mapper_params(jax.random.PRNGKey(0), 1, tokens_in=n_tokens,
                               width=self.clip_cfg.width), 0)
        trainfn = self._jit(("train", num_inner_steps), lambda: jax.jit(
            lambda p, tr, gm, it, u, c, g2, m0: train_mappers(
                p, pipe.schedule, tr, gm, it, u, c, g2, m0, pipe.config.unet,
                num_inner_steps=num_inner_steps)))
        mappers = trainfn(pipe.params["unet"], traj, gt_maps, img_tokens,
                          uncond1, cond_src, g, mapper0)

        prompts = [prompt_src, prompt_tar]
        cond = pipe.encode_prompt(prompts)
        uncond = pipe.encode_prompt(["", ""])
        x_t = traj[-1]
        zeros = jnp.zeros((T, 2) + x_t.shape[1:], pipe.dtype)
        rm = jnp.zeros((2,), pipe.dtype)

        # 3) reconstruction pass: v_replace=1.0, store-only controller
        recon_spec = StyleDiffusionSpec(batch_size=2, num_steps=T, v_replace_end=T)
        recon_fn = self._jit(("recon", recon_spec), lambda: jax.jit(
            lambda p, x, c, u, g2, tensors, nl, r: guidance_forward(
                p, pipe.schedule, pipe.config.unet, x, c, u, g2,
                StyleDiffusionControl(recon_spec), tensors, nl, r)))
        tensors_recon = {"img_tokens": img_tokens, "sd_mapper": mappers}
        recon_lat = recon_fn(pipe.params["unet"], x_t, cond, uncond, g,
                             tensors_recon, zeros, rm)
        recon = np.asarray(dec(pipe.params["vae"], recon_lat[:1]))[0]

        # 4) edit pass with taus. The reference ignores the runner's
        # is_replace_controller=False (:253) — :181 selects Replace by
        # char-length equality of the stripped prompts (stylediffusion_is_replace)
        is_replace = (bool(is_replace_controller)
                      if is_replace_controller is not None
                      else stylediffusion_is_replace(prompt_src, prompt_tar))
        p2p, p2p_tensors = make_p2p_control(
            prompts, pipe.tokenizer, num_steps=T,
            cross_replace_steps={"default_": tau_c}, self_replace_steps=tau_s,
            is_replace_controller=is_replace, blend_words=blend_word,
            eq_params=eq_params, num_lb_slots=pipe.num_lb_slots,
            lb_res=pipe.lb_res, latent_size=pipe.latent_size)
        edit_spec = StyleDiffusionSpec(
            batch_size=2, num_steps=T, v_replace_end=int(tau_v * T),
            uncond_self_start=0, uncond_self_end=int(tau_u * T))
        edit_fn = self._jit(("edit", edit_spec, p2p.spec), lambda: jax.jit(
            lambda p, x, c, u, g2, tensors, nl, r: guidance_forward(
                p, pipe.schedule, pipe.config.unet, x, c, u, g2,
                StyleDiffusionControl(edit_spec, p2p), tensors, nl, r)))
        tensors_edit = dict(p2p_tensors)
        tensors_edit.update({"img_tokens": img_tokens, "sd_mapper": mappers})
        edit_lat = edit_fn(pipe.params["unet"], x_t, cond, uncond, g,
                           tensors_edit, zeros, rm)
        edit = np.asarray(dec(pipe.params["vae"], edit_lat[-1:]))[0]

        size = pipe.config.vae.sample_size
        instruct = txt_draw(
            f"source prompt: {prompt_src}\ntarget prompt: {prompt_tar}",
            target_size=(size, size))
        return make_strip([instruct, image_gt, recon, edit])
