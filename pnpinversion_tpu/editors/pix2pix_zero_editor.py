"""pix2pix-zero editor
(reference: /root/reference/run_editing_pix2pix_zero.py).

Flow: BLIP-caption the input image (the caption is both the inversion prompt
and the negative prompt), invert with noise regularization, compute the edit
direction as the difference of the source/target sentence embeddings
(:56-70,89-95), then the two-pass cross-attention-guided edit
(XA_GUIDANCE=0.1). directinversion+pix2pix-zero threads the inversion
trajectory offsets through both passes (edit_pipeline.py:111-113,170-171).

The captioner is injectable; ``caption=`` overrides it (useful without BLIP
weights). Output strip: [instruction | gt | recon | edit].
"""
from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pnpinversion_tpu.inversion.pix2pix_zero import p2z_edit, p2z_invert
from pnpinversion_tpu.models.vae import latent_to_image, vae_encode
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.schedulers.ddim import make_ddim_schedule
from pnpinversion_tpu.utils.image import make_strip, txt_draw

XA_GUIDANCE = 0.1


def construct_direction(pipe: SDPipeline, src_sentences, tgt_sentences):
    """Mean sentence-embedding difference (models/pix2pix_zero/edit_directions.py:22-27
    generalized: the reference loads precomputed banks; the runner computes it
    from the prompts directly, run_editing_pix2pix_zero.py:56-70)."""
    emb_src = pipe.encode_prompt(list(src_sentences)).mean(axis=0, keepdims=True)
    emb_tar = pipe.encode_prompt(list(tgt_sentences)).mean(axis=0, keepdims=True)
    return emb_tar - emb_src


class Pix2PixZeroEditor:
    def __init__(self, pipeline: SDPipeline, captioner: Optional[Callable] = None,
                 steps_offset: int = 1):
        self.pipe = pipeline
        self.captioner = captioner
        self.schedule = make_ddim_schedule(
            num_steps=pipeline.schedule.num_steps, steps_offset=steps_offset)
        self._jit_cache: Dict = {}

    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def _caption(self, image: np.ndarray) -> str:
        if self.captioner is None:
            raise ValueError(
                "no captioner configured; pass caption= or provide a BLIP captioner")
        return self.captioner(image)

    def __call__(self, edit_method, image_path, prompt_src, prompt_tar,
                 guidance_scale=7.5, caption: Optional[str] = None) -> Image.Image:
        if edit_method == "ddim+pix2pix-zero":
            return self.edit(image_path, prompt_src, prompt_tar, guidance_scale,
                             caption, use_offsets=False)
        if edit_method == "directinversion+pix2pix-zero":
            return self.edit(image_path, prompt_src, prompt_tar, guidance_scale,
                             caption, use_offsets=True)
        raise NotImplementedError(f"No edit method named {edit_method}")

    def edit(self, image_path, prompt_src, prompt_tar, guidance_scale=7.5,
             caption: Optional[str] = None, use_offsets: bool = False,
             seed: int = 1234) -> Image.Image:
        pipe = self.pipe
        size = pipe.config.vae.sample_size
        if isinstance(image_path, str):
            image_gt = np.asarray(
                Image.open(image_path).convert("RGB").resize(
                    (size, size), Image.Resampling.LANCZOS))
        else:
            image_gt = np.asarray(image_path)
        caption = caption if caption is not None else self._caption(image_gt)

        rng = jax.random.PRNGKey(seed)
        k_enc, k_inv = jax.random.split(rng)

        enc = self._jit("enc", lambda: jax.jit(
            lambda p, img, k: vae_encode(
                p, (img.astype(pipe.dtype) / 127.5 - 1.0)[None],
                pipe.config.vae, rng=k)))
        dec = self._jit("dec", lambda: jax.jit(
            lambda p, z: latent_to_image(p, z, pipe.config.vae)))
        # the reference samples the VAE posterior for this method (ddim_inv.py:84)
        latent = enc(pipe.params["vae"], jnp.asarray(image_gt), k_enc)

        cond_caption = pipe.encode_prompt([caption])
        inv = self._jit("inv", lambda: jax.jit(
            lambda p, lat, emb, k: p2z_invert(
                p, self.schedule, lat, emb, pipe.config.unet, k)))
        traj = inv(pipe.params["unet"], latent, cond_caption, k_inv)

        # edit direction: mean sentence-embedding difference (runner :56-70)
        emb_src = pipe.encode_prompt([prompt_src]).mean(axis=0, keepdims=True)
        emb_tar = pipe.encode_prompt([prompt_tar]).mean(axis=0, keepdims=True)
        edit_dir = (emb_tar - emb_src).astype(pipe.dtype)

        # negative prompt = caption (runner :97)
        prompt_embeds = jnp.concatenate([cond_caption, cond_caption], axis=0)

        key = ("edit", use_offsets)
        fn = self._jit(key, lambda: jax.jit(
            lambda p, x, pe, ed, g, ll: p2z_edit(
                p, self.schedule, x, pe, ed, g, XA_GUIDANCE, pipe.config.unet,
                latent_list=ll if use_offsets else None)))
        rec, edit = fn(pipe.params["unet"], traj[-1], prompt_embeds, edit_dir,
                       jnp.asarray(guidance_scale, pipe.dtype),
                       traj if use_offsets else traj)

        recon_img = np.asarray(dec(pipe.params["vae"], rec))[0]
        edit_img = np.asarray(dec(pipe.params["vae"], edit))[0]
        instruct = txt_draw(
            f"source prompt: {prompt_src}\ntarget prompt: {prompt_tar}",
            target_size=(size, size))
        return make_strip([instruct, image_gt, recon_img, edit_img])
