"""Prompt-to-Prompt attention control as traced pure functions.

Replaces the reference's mutable controller-class hierarchy
(/root/reference/models/p2p/attention_control.py:162-405):
AttentionStore / AttentionControlEdit / AttentionReplace / AttentionRefine /
AttentionReweight / LocalBlend. All step-dependent behavior lowers to
`jnp.where` masks on a traced step index; per-image arrays (alpha schedules,
mappers, equalizers, blend-word selectors) are traced inputs so new prompts
never retrigger compilation.

Batch layout convention (same as the reference's CFG batch,
p2p_guidance_forward.py:11-13): the UNet is called with 2B rows
[uncond x B, cond x B]; only the cond half is edited
(attention_control.py:183-184), and row B (cond source) is the edit base.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pnpinversion_tpu.control.base import AttnSite, BaseControl
from pnpinversion_tpu.utils import text as text_utils

Array = jax.Array

SELF_EDIT_MAX_SEQ = 32 * 32  # replace_self_attention threshold (ref :259)


@dataclasses.dataclass(frozen=True, eq=True)
class P2PSpec:
    """Static description of a P2P controller stack."""

    kind: str  # 'replace' | 'refine'
    batch_size: int  # number of prompts (source first)
    num_steps: int
    self_replace_start: int
    self_replace_end: int
    reweight: bool = False
    local_blend: bool = False
    lb_start_blend: int = 10  # int(0.2 * num_steps)
    lb_th: Tuple[float, float] = (0.3, 0.3)
    lb_substruct: bool = False
    num_lb_slots: int = 5
    lb_res: int = 16
    latent_size: int = 64
    # fused multi-phase batches: the cond half holds ``cond_groups`` groups of
    # batch_size rows; only group ``edit_group`` is edited (its first row is
    # the base). Default (1, 0) == the reference's plain CFG batch.
    cond_groups: int = 1
    edit_group: int = 0
    # self-attn replace size threshold: 32² for P2P (attention_control.py:259),
    # 16² for edit-friendly DDPM's controller copy (ptp_classes.py:106)
    self_edit_max_seq: int = SELF_EDIT_MAX_SEQ
    # rows in the uncond half of the batch; -1 == cond_groups * batch_size
    # (the reference's symmetric CFG batch). The source-free fused scan
    # (p2p_forward.fused_direct_inversion_edit_srcfree) drops the dead
    # uncond-source row and sets this to batch_size - 1.
    uncond_rows: int = -1


class P2PControl(BaseControl):
    """One controller instance per (spec); tensors/state passed per call."""

    def __init__(self, spec: P2PSpec):
        self.spec = spec

    # -- state ---------------------------------------------------------------
    def init_state(self, batch_size: int, dtype=jnp.float32, heads: int = 8,
                   max_words: int = 77) -> Dict[str, Array]:
        if not self.spec.local_blend:
            return {}
        s = self.spec
        return {
            "lb_maps": jnp.zeros(
                (s.num_lb_slots, s.batch_size, heads, s.lb_res * s.lb_res, max_words),
                dtype=jnp.float32,
            )
        }

    # -- attention -----------------------------------------------------------
    def needs_probs(self, site: AttnSite) -> bool:
        # cross maps are tiny (Sk=77) and needed for the mapper edits/store;
        # self-attn edits go through attention_override so the fused path
        # never materializes (rows, S, S) scores for the whole batch
        return site.is_cross

    def attention_override(self, site, q, k, v, scale, tensors, state, step):
        """Self-attention replace without batch-wide probs: flash for every
        row, then overwrite the edited rows with base_probs @ v_row (only ONE
        row's scores are materialized)."""
        if site.is_cross or site.seq_len > self.spec.self_edit_max_seq:
            return None
        from pnpinversion_tpu.ops.attention import (
            apply_probs,
            attention_probs,
            fused_attention,
        )

        B = self.spec.batch_size
        half = self.spec.uncond_rows
        if half < 0:
            half = self.spec.cond_groups * B
        lo = half + self.spec.edit_group * B

        out = fused_attention(q, k, v, scale)
        base_probs = attention_probs(q[lo : lo + 1], k[lo : lo + 1], scale)
        edited = apply_probs(jnp.broadcast_to(base_probs,
                                              (B - 1,) + base_probs.shape[1:]),
                             v[lo + 1 : lo + B])
        in_window = (step >= self.spec.self_replace_start) & (
            step < self.spec.self_replace_end)
        new_rows = jnp.where(in_window, edited, out[lo + 1 : lo + B])
        out = jax.lax.dynamic_update_slice_in_dim(out, new_rows, lo + 1, axis=0)
        return out, state

    def probs_hook(self, site, probs, tensors, state, step):
        B = self.spec.batch_size
        G = self.spec.cond_groups
        half = self.spec.uncond_rows if self.spec.uncond_rows >= 0 else G * B
        uncond, cond_all = probs[:half], probs[half:]
        lo = self.spec.edit_group * B
        cond = cond_all[lo : lo + B]

        if self.spec.local_blend and site.lb_slot >= 0 and site.is_cross:
            # pre-edit cond-half maps, accumulated across steps (the reference
            # sums step stores in between_steps, attention_control.py:227-234)
            state = dict(state)
            state["lb_maps"] = state["lb_maps"].at[site.lb_slot].add(cond)

        base, repl = cond[0], cond[1:]
        if site.is_cross:
            alpha_words = jax.lax.dynamic_index_in_dim(
                tensors["cross_replace_alpha"], step, axis=0, keepdims=False
            )  # (B-1, 1, 1, 77)
            if self.spec.kind == "replace":
                new = jnp.einsum("hpw,bwn->bhpn", base, tensors["mapper"])
            else:  # refine
                mapper = tensors["mapper"]  # (B-1, 77) int32
                base_g = jnp.take(base, mapper, axis=2)  # (H, Sq, B-1, 77)
                base_g = base_g.transpose(2, 0, 1, 3)
                alphas = tensors["alphas"][:, None, None, :]
                new = base_g * alphas + repl * (1.0 - alphas)
            if self.spec.reweight:
                new = new * tensors["equalizer"][:, None, None, :]
            new = new * alpha_words + (1.0 - alpha_words) * repl
            cond = jnp.concatenate([cond[:1], new], axis=0)
        elif site.seq_len <= self.spec.self_edit_max_seq:
            in_window = (step >= self.spec.self_replace_start) & (
                step < self.spec.self_replace_end
            )
            base_b = jnp.broadcast_to(base[None], repl.shape)
            new = jnp.where(in_window, base_b, repl)
            cond = jnp.concatenate([cond[:1], new], axis=0)

        if G == 1:
            return jnp.concatenate([uncond, cond], axis=0), state
        cond_all = jnp.concatenate(
            [cond_all[:lo], cond, cond_all[lo + B:]], axis=0)
        return jnp.concatenate([uncond, cond_all], axis=0), state

    # -- LocalBlend step callback ---------------------------------------------
    def step_callback(self, latents, tensors, state, step):
        if not self.spec.local_blend:
            return latents, state
        s = self.spec
        maps = state["lb_maps"]  # (slots, B, H, res*res, 77)
        nslots, B, H, sq, W = maps.shape
        maps = maps.transpose(1, 0, 2, 3, 4).reshape(B, nslots * H, s.lb_res, s.lb_res, W)

        def get_mask(selector: Array, use_pool: bool, th: float) -> Array:
            m = (maps * selector[:, None, None, None, :]).sum(-1).mean(1)  # (B, res, res)
            if use_pool:
                m = jax.lax.reduce_window(
                    m, -jnp.inf, jax.lax.max,
                    window_dimensions=(1, 3, 3), window_strides=(1, 1, 1),
                    padding="SAME",
                )
            m = jax.image.resize(m, (B, s.latent_size, s.latent_size), method="nearest")
            m = m / jnp.max(m, axis=(1, 2), keepdims=True)
            m = m > th
            return m[:1] | m  # union with the source-prompt mask (ref :105)

        mask = get_mask(tensors["lb_alpha_layers"], True, s.lb_th[0])
        if s.lb_substruct:
            mask = mask & (~get_mask(tensors["lb_substruct_layers"], False, s.lb_th[1]))
        mask = mask.astype(latents.dtype)[..., None]  # (B, lat, lat, 1)
        blended = latents[:1] + mask * (latents - latents[:1])
        active = (step + 1) > s.lb_start_blend
        return jnp.where(active, blended, latents), state


class SpatialReplaceControl(BaseControl):
    """SpatialReplace (attention_control.py:201-211): before ``stop_inject``
    steps, broadcast the source latent row to the whole batch after each step."""

    def __init__(self, stop_inject: float, num_ddim_steps: int = 50):
        self.stop_inject = int((1 - stop_inject) * num_ddim_steps)

    def step_callback(self, latents, tensors, state, step):
        src = jnp.broadcast_to(latents[:1], latents.shape)
        return jnp.where(step < self.stop_inject, src, latents), state


# ---------------------------------------------------------------------------
# host-side builder (mirrors make_controller, attention_control.py:366-405)
# ---------------------------------------------------------------------------

def make_p2p_control(
    prompts: Sequence[str],
    tokenizer,
    num_steps: int = 50,
    cross_replace_steps=0.4,
    self_replace_steps=0.6,
    is_replace_controller: bool = False,
    blend_words: Optional[Sequence] = None,
    eq_params: Optional[dict] = None,
    lb_start_blend: float = 0.2,
    lb_th: Tuple[float, float] = (0.3, 0.3),
    substruct_words: Optional[Sequence] = None,
    num_lb_slots: int = 5,
    lb_res: int = 16,
    latent_size: int = 64,
    self_edit_max_seq: int = SELF_EDIT_MAX_SEQ,
) -> Tuple[P2PControl, Dict[str, Array]]:
    """Build (control, tensors) for an edit. All tensors are jnp arrays."""
    B = len(prompts)
    if isinstance(self_replace_steps, float):
        self_replace_steps = (0.0, self_replace_steps)
    spec = P2PSpec(
        kind="replace" if is_replace_controller else "refine",
        batch_size=B,
        num_steps=num_steps,
        self_replace_start=int(num_steps * self_replace_steps[0]),
        self_replace_end=int(num_steps * self_replace_steps[1]),
        reweight=eq_params is not None,
        local_blend=blend_words is not None,
        lb_start_blend=int(lb_start_blend * num_steps),
        lb_th=lb_th,
        lb_substruct=substruct_words is not None,
        num_lb_slots=num_lb_slots,
        lb_res=lb_res,
        latent_size=latent_size,
        self_edit_max_seq=self_edit_max_seq,
    )

    tensors: Dict[str, Array] = {
        "cross_replace_alpha": jnp.asarray(
            text_utils.get_time_words_attention_alpha(
                prompts, num_steps,
                {"default_": cross_replace_steps}
                if not isinstance(cross_replace_steps, dict) else cross_replace_steps,
                tokenizer,
            )
        )
    }
    if spec.kind == "replace":
        tensors["mapper"] = jnp.asarray(text_utils.get_replacement_mapper(prompts, tokenizer))
    else:
        mapper, alphas = text_utils.get_refinement_mapper(prompts, tokenizer)
        tensors["mapper"] = jnp.asarray(mapper, dtype=jnp.int32)
        tensors["alphas"] = jnp.asarray(alphas)
    if spec.reweight:
        tensors["equalizer"] = jnp.asarray(
            text_utils.get_equalizer(prompts[1], eq_params["words"], eq_params["values"], tokenizer)
        )
    if spec.local_blend:
        tensors["lb_alpha_layers"] = jnp.asarray(
            _word_selector(prompts, blend_words, tokenizer)
        )
        if substruct_words is not None:
            tensors["lb_substruct_layers"] = jnp.asarray(
                _word_selector(prompts, substruct_words, tokenizer)
            )
    return P2PControl(spec), tensors


def _word_selector(prompts, words, tokenizer, max_words: int = 77) -> np.ndarray:
    sel = np.zeros((len(prompts), max_words), dtype=np.float32)
    for i, (prompt, ws) in enumerate(zip(prompts, words)):
        if isinstance(ws, str):
            ws = [ws]
        for w in ws:
            ind = text_utils.get_word_inds(prompt, w, tokenizer)
            sel[i, ind] = 1.0
    return sel
