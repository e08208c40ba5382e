"""EDICT editor: coupled-latent exactly-invertible editing.

Parity: /root/reference/models/edict/edict_functions.py —
``coupled_stablediffusion`` (:707-956: alternating leapfrog updates where
each latent is stepped using the OTHER latent as UNet input, plus the
mixing/unmixing layers) and ``EDICT_editing`` (:56-115: invert with the
source prompt at strength 0.8, then regenerate with the target prompt).
Runner (/root/reference/run_editing_edict.py:33-61): the recon panel is a
full strength-1.0 guidance-7.0 round trip; the edit is EDICT_editing with
guidance 3. Output strip: [instruction | gt | recon | edit].

Methods: edict+direct_forward (target prompt directly) and edict+p2p
(source prompt + cross/self-attention takeover from the edit prompt).
"""
from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pnpinversion_tpu.control.base import NO_CONTROL, BaseControl
from pnpinversion_tpu.data.pie_bench import load_image
from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.models.vae import image_to_latent, latent_to_image
from pnpinversion_tpu.pipeline import SDPipeline
from pnpinversion_tpu.schedulers.ddim import classifier_free_guidance, make_ddim_schedule
from pnpinversion_tpu.schedulers.edict import (
    edict_forward_step,
    edict_mix,
    edict_reverse_step,
    edict_unmix,
)
from pnpinversion_tpu.utils.image import make_strip, txt_draw

Array = jax.Array


def coupled_scan(
    params,
    schedule,
    config,
    pair: Array,  # (2, 1, h, w, c)
    context: Array,  # (2, 77, D) [uncond, cond]
    guidance_scale: Array,
    num_steps: int,
    t_limit: int,
    reverse: bool,
    mix_weight: float = 0.93,
    leapfrog: bool = True,
    control: BaseControl = NO_CONTROL,
    tensors=None,
    edit_context: Optional[Array] = None,  # (1, 77, D) for the p2p takeover
    precision: str = "f32",  # "f32" | "df64" (double-float latent carry)
    pair_lo: Optional[Array] = None,  # df64: low words of the input pair
    return_lo: bool = False,  # df64: also return the low words
):
    """One EDICT pass over timesteps[t_limit:] (flipped when reverse).

    precision="df64" carries the latent pair as double-float (two f32 words,
    schedulers/edict_df.py), emulating the reference's float64 step/mix
    algebra (edict_functions.py:50-52) at TPU speed; the UNet still runs f32.
    """
    ts = schedule.timesteps[t_limit:]
    if reverse:
        ts = ts[::-1]
    L = ts.shape[0]
    step_fn = edict_reverse_step if reverse else edict_forward_step
    if precision == "df64":
        from pnpinversion_tpu.schedulers.edict_df import edict_df_coeffs

        a_hi, a_lo, c_hi, c_lo = (jnp.asarray(x) for x in edict_df_coeffs(
            num_steps, t_limit, reverse, schedule.num_train_timesteps))

    def eps_at(x, t, state, step):
        if edit_context is None:
            x2 = jnp.concatenate([x, x], axis=0)
            out, state = unet_apply(params, x2, t, context, config,
                                    control, tensors, state, step=step)
            eps_u, eps_c = out[:1], out[1:]
        else:
            # p2p takeover: one batch-3 call [uncond, base-cond, edit-cond];
            # the control splices the base row's attention into the edit row
            # (replaces the reference's 3 sequential calls + map storage,
            # edict_functions.py:884-929)
            x3 = jnp.concatenate([x, x, x], axis=0)
            ctx3 = jnp.concatenate([context, edit_context], axis=0)
            out, state = unet_apply(params, x3, t, ctx3, config,
                                    control, tensors, state, step=step)
            eps_u, eps_c = out[:1], out[2:]
        return classifier_free_guidance(eps_u, eps_c, guidance_scale), state

    def _first_index(i):
        """Leapfrog update order (edict_functions.py:867-878)."""
        if reverse:
            if leapfrog:
                orig_i = L - (i + 1)
                return (0 + (orig_i + 1)) % 2
            return 1
        return (0 + i) % 2 if leapfrog else 0

    def upd(pair_, idx, t, state, step):
        j = 1 - idx
        x_in = jax.lax.dynamic_index_in_dim(pair_, j, axis=0, keepdims=False)
        base = jax.lax.dynamic_index_in_dim(pair_, idx, axis=0, keepdims=False)
        eps, state = eps_at(x_in, t, state, step)
        new = step_fn(schedule, eps, t, base)
        return jax.lax.dynamic_update_index_in_dim(pair_, new, idx, axis=0), state

    def body(carry, i):
        pair_, state = carry
        t = ts[i]
        if reverse:
            pair_ = edict_unmix(pair_, mix_weight)
        a = _first_index(i)
        pair_, state = upd(pair_, a, t, state, i)
        pair_, state = upd(pair_, 1 - a, t, state, i)
        if not reverse:
            pair_ = edict_mix(pair_, mix_weight)
        return (pair_, state), ()

    # --- double-float variant: latent carry = (hi, lo) float32 pairs -------
    def upd_df(hi, lo, idx, i, t, state, step):
        from pnpinversion_tpu.schedulers.edict_df import DF, edict_step_df

        j = 1 - idx
        x_in = jax.lax.dynamic_index_in_dim(hi, j, axis=0, keepdims=False)
        base = DF(jax.lax.dynamic_index_in_dim(hi, idx, axis=0, keepdims=False),
                  jax.lax.dynamic_index_in_dim(lo, idx, axis=0, keepdims=False))
        eps, state = eps_at(x_in, t, state, step)
        new = edict_step_df(base, eps.astype(jnp.float32),
                            a_hi[i], a_lo[i], c_hi[i], c_lo[i])
        hi = jax.lax.dynamic_update_index_in_dim(hi, new.hi, idx, axis=0)
        lo = jax.lax.dynamic_update_index_in_dim(lo, new.lo, idx, axis=0)
        return hi, lo, state

    def body_df(carry, i):
        from pnpinversion_tpu.schedulers.edict_df import (
            DF,
            edict_mix_df,
            edict_unmix_df,
        )

        hi, lo, state = carry
        t = ts[i]
        if reverse:
            x0, x1 = edict_unmix_df(DF(hi[0], lo[0]), DF(hi[1], lo[1]), mix_weight)
            hi = jnp.stack([x0.hi, x1.hi]); lo = jnp.stack([x0.lo, x1.lo])
        a = _first_index(i)
        hi, lo, state = upd_df(hi, lo, a, i, t, state, i)
        hi, lo, state = upd_df(hi, lo, 1 - a, i, t, state, i)
        if not reverse:
            x0, x1 = edict_mix_df(DF(hi[0], lo[0]), DF(hi[1], lo[1]), mix_weight)
            hi = jnp.stack([x0.hi, x1.hi]); lo = jnp.stack([x0.lo, x1.lo])
        return (hi, lo, state), ()

    state0 = control.init_state(1, pair.dtype, heads=config.num_heads)
    if precision == "df64":
        hi0 = pair.astype(jnp.float32)
        lo0 = jnp.zeros_like(hi0) if pair_lo is None else pair_lo.astype(jnp.float32)
        (hi, lo, _), _ = jax.lax.scan(body_df, (hi0, lo0, state0), jnp.arange(L))
        return (hi, lo) if return_lo else hi + lo
    (pair, _), _ = jax.lax.scan(body, (pair, state0), jnp.arange(L))
    return pair


class EDICTEditor:
    """EDICT's exact invertibility is precision-critical (the reference runs
    float64, edict_functions.py:50-52). TPUs have no fast f64; we run the
    coupled scans in float32 (precision="f32", default) or in double-float
    latent emulation (precision="df64", schedulers/edict_df.py) which tracks
    the reference's f64 step/mix algebra at TPU speed — the UNet itself stays
    f32 in both modes. tests/test_edict.py quantifies the recon error of each
    mode against the reference's recon_test (edict_functions.py:118-168)."""

    def __init__(self, pipeline: SDPipeline, precision: str = "f32"):
        assert precision in ("f32", "df64"), precision
        self.pipe = pipeline
        self.precision = precision
        # EDICT constructs a plain DDIMScheduler (steps_offset=0)
        self.schedule = make_ddim_schedule(num_steps=pipeline.schedule.num_steps)
        self._jit_cache: Dict = {}
        self._f32_params = None

    def _unet_f32(self):
        if self._f32_params is None:
            self._f32_params = jax.tree.map(
                lambda x: x.astype(jnp.float32)
                if hasattr(x, "dtype") and x.dtype == jnp.bfloat16 else x,
                self.pipe.params["unet"])
        return self._f32_params

    def _jit(self, key, builder):
        if key not in self._jit_cache:
            self._jit_cache[key] = builder()
        return self._jit_cache[key]

    def _coupled(self, t_limit: int, reverse: bool, mix_weight: float,
                 use_p2p: bool = False, p2p_tensors_key=None):
        """df64 mode: the jitted fn takes/returns (pair_hi, pair_lo) so the
        low words survive between the inversion and generation passes."""
        sched, ucfg = self.schedule, self.pipe.config.unet
        T = sched.num_steps
        prec = self.precision
        key = ("coupled", t_limit, reverse, mix_weight, use_p2p, p2p_tensors_key,
               prec)

        def build():
            if use_p2p:
                from pnpinversion_tpu.control.edict_p2p import EdictP2PControl

                def fn(p, pair, ctx, g, tensors, edit_ctx, pair_lo=None):
                    control = EdictP2PControl(num_steps=T)
                    return coupled_scan(p, sched, ucfg, pair, ctx, g, T, t_limit,
                                        reverse, mix_weight, control=control,
                                        tensors=tensors, edit_context=edit_ctx,
                                        precision=prec, pair_lo=pair_lo,
                                        return_lo=(prec == "df64"))
            else:
                def fn(p, pair, ctx, g, tensors=None, edit_ctx=None, pair_lo=None):
                    return coupled_scan(p, sched, ucfg, pair, ctx, g, T, t_limit,
                                        reverse, mix_weight, precision=prec,
                                        pair_lo=pair_lo,
                                        return_lo=(prec == "df64"))

            return jax.jit(fn)

        return self._jit(key, build)

    def __call__(self, edit_method, image_path, prompt_src, prompt_tar) -> Image.Image:
        if edit_method == "edict+direct_forward":
            return self.edit(image_path, prompt_src, prompt_tar, use_p2p=False)
        if edit_method == "edict+p2p":
            return self.edit(image_path, prompt_src, prompt_tar, use_p2p=True)
        raise NotImplementedError(f"No edit method named {edit_method}")

    def edit(self, image_path, prompt_src, prompt_tar, use_p2p=False,
             steps=50, mix_weight=0.93, init_image_strength=0.8,
             guidance_scale=3.0, recon_guidance_scale=7.0) -> Image.Image:
        pipe = self.pipe
        T = self.schedule.num_steps
        image_gt = load_image(image_path, pipe.config.vae.sample_size)

        enc = self._jit("enc", lambda: jax.jit(
            lambda p, img: image_to_latent(p, img, pipe.config.vae, dtype=jnp.float32)))
        dec = self._jit("dec", lambda: jax.jit(
            lambda p, z: latent_to_image(p, z, pipe.config.vae)))

        latent = enc(pipe.params["vae"], jnp.asarray(image_gt))
        pair0 = jnp.stack([latent, latent], axis=0)
        uncond = pipe.encode_prompt([""])
        cond_src = pipe.encode_prompt([prompt_src])
        cond_tar = pipe.encode_prompt([prompt_tar])
        ctx_src = jnp.concatenate([uncond, cond_src], axis=0)
        ctx_tar = jnp.concatenate([uncond, cond_tar], axis=0)

        df = self.precision == "df64"

        # recon panel: full round trip at strength 1.0, guidance 7.0
        g7 = jnp.asarray(recon_guidance_scale, pipe.dtype)
        inv_full = self._coupled(0, True, mix_weight)(
            self._unet_f32(), pair0, ctx_src, g7)
        inv_hi, inv_lo = inv_full if df else (inv_full, None)
        rec_pair = self._coupled(0, False, mix_weight)(
            self._unet_f32(), inv_hi, ctx_src, g7, pair_lo=inv_lo)
        if df:
            rec_pair = rec_pair[0] + rec_pair[1]
        recon = np.asarray(dec(pipe.params["vae"], rec_pair[0]))[0]

        # edit: strength 0.8, guidance 3
        t_limit = T - int(T * init_image_strength)
        g3 = jnp.asarray(guidance_scale, pipe.dtype)
        inv_pair = self._coupled(t_limit, True, mix_weight)(
            self._unet_f32(), pair0, ctx_src, g3)
        inv_hi, inv_lo = inv_pair if df else (inv_pair, None)
        if not use_p2p:
            out_pair = self._coupled(t_limit, False, mix_weight)(
                self._unet_f32(), inv_hi, ctx_tar, g3, pair_lo=inv_lo)
        else:
            from pnpinversion_tpu.control.edict_p2p import make_edict_p2p_tensors

            tensors = make_edict_p2p_tensors(
                prompt_src, prompt_tar, pipe.tokenizer, pipe.config.text.max_length)
            out_pair = self._coupled(t_limit, False, mix_weight, use_p2p=True)(
                self._unet_f32(), inv_hi, ctx_src, g3, tensors, cond_tar,
                pair_lo=inv_lo)
        if df:
            out_pair = out_pair[0] + out_pair[1]
        edit = np.asarray(dec(pipe.params["vae"], out_pair[0]))[0]

        size = pipe.config.vae.sample_size
        instruct = txt_draw(
            f"source prompt: {prompt_src}\ntarget prompt: {prompt_tar}",
            target_size=(size, size))
        return make_strip([instruct, image_gt, recon, edit])
