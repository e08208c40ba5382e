"""MasaCtrl mutual self-attention control, traced.

Replaces /root/reference/models/masactrl/masactrl.py:14-111 (editor protocol
from masactrl_utils.py:14-76). Semantics: at self-attention sites whose
transformer-block index >= start_layer (SD1.4 has 16 blocks; default 10 =>
the two finest decoder levels) and steps >= start_step, every row in each
CFG half attends to the K/V of that half's FIRST row (the source branch) —
q is kept, so the target keeps its layout but borrows source appearance.

Because this is a K/V rewrite (not a probs edit), the fused flash-attention
path stays available — no score matrices are materialized.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from pnpinversion_tpu.control.base import AttnSite, BaseControl

Array = jax.Array


@dataclasses.dataclass(frozen=True, eq=True)
class MasaCtrlSpec:
    start_step: int = 4
    start_layer: int = 10
    total_layers: int = 16  # SD; 70 for SDXL (masactrl.py:15-18)
    union: bool = False  # MutualSelfAttentionControlUnion (:75-111)


def _masked_fg_bg_attention(q_t, k_s, v_s, scale, key_mask, query_mask):
    """Target queries attend to source K/V twice — once over foreground keys,
    once over background — blended per query pixel (masactrl.py:138-193).

    q_t/k_s/v_s: (H, S, D); key_mask/query_mask: (S,) in {0,1}.
    """
    s = jnp.einsum("hqd,hkd->hqk", q_t, k_s,
                   preferred_element_type=jnp.float32).astype(jnp.float32) * scale
    neg = jnp.finfo(jnp.float32).min
    sim_fg = s + jnp.where(key_mask == 0, neg, 0.0)[None, None, :]
    sim_bg = s + jnp.where(key_mask == 1, neg, 0.0)[None, None, :]
    out_fg = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(sim_fg, -1), v_s.astype(jnp.float32))
    out_bg = jnp.einsum("hqk,hkd->hqd", jax.nn.softmax(sim_bg, -1), v_s.astype(jnp.float32))
    qm = query_mask[None, :, None]
    return (out_fg * qm + out_bg * (1.0 - qm)).astype(q_t.dtype)


class MasaCtrlMaskControl(BaseControl):
    """MutualSelfAttentionControlMask (masactrl.py:114-193): explicit source/
    target masks steer fg/bg separation. tensors: 'mask_s'/'mask_t' (Hm, Wm)
    in {0,1} (interpolated to each site's resolution)."""

    def __init__(self, spec: MasaCtrlSpec):
        self.spec = spec

    def attention_override(self, site, q, k, v, scale, tensors, state, step):
        if site.is_cross or site.index < self.spec.start_layer:
            return None
        B = q.shape[0] // 2
        res = site.resolution
        mask_s = jax.image.resize(tensors["mask_s"].astype(jnp.float32),
                                  (res, res), "nearest").reshape(-1)
        mask_t = jax.image.resize(tensors["mask_t"].astype(jnp.float32),
                                  (res, res), "nearest").reshape(-1)
        active = step >= self.spec.start_step

        def half(lo):
            # half rows are [source, ..., target]; target = last (qu[-h:], :178)
            src_q, tgt_q = q[lo], q[lo + B - 1]
            k_s, v_s = k[lo], v[lo]
            out_src = jnp.einsum(
                "hqk,hkd->hqd",
                jax.nn.softmax(jnp.einsum("hqd,hkd->hqk", src_q, k_s,
                                          preferred_element_type=jnp.float32
                                          ).astype(jnp.float32) * scale, -1),
                v_s.astype(jnp.float32)).astype(q.dtype)
            out_tgt = _masked_fg_bg_attention(tgt_q, k_s, v_s, scale, mask_s, mask_t)
            return out_src, out_tgt

        ou_s, ou_t = half(0)
        oc_s, oc_t = half(B)
        out = jnp.stack([ou_s, ou_t, oc_s, oc_t], axis=0)

        # inactive steps: plain attention on own q/k/v
        plain_probs = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32).astype(jnp.float32) * scale, -1)
        plain = jnp.einsum("bhqk,bhkd->bhqd", plain_probs,
                           v.astype(jnp.float32)).astype(q.dtype)
        return jnp.where(active, out, plain), state


class MasaCtrlMaskAutoControl(BaseControl):
    """MutualSelfAttentionControlMaskAuto (masactrl.py:196-334): masks derived
    at runtime from the running mean of this step's 16x16 cross-attn maps of
    given token indices. tensors: 'ref_token_mask'/'cur_token_mask' (77,)
    one-hot selectors; spec.thres binarizes."""

    def __init__(self, spec: MasaCtrlSpec, thres: float = 0.1,
                 agg_res: int = 16):
        self.spec = spec
        self.thres = thres
        self.agg_res = agg_res

    def init_state(self, batch_size, dtype=None, heads: int = 8, max_words: int = 77):
        n = self.agg_res * self.agg_res
        return {
            "mc_cross_sum": jnp.zeros((2 * batch_size, n, max_words), jnp.float32),
            "mc_cross_cnt": jnp.zeros((), jnp.float32),
        }

    def needs_probs(self, site: AttnSite) -> bool:
        return site.is_cross and site.resolution == self.agg_res

    def probs_hook(self, site, probs, tensors, state, step):
        state = dict(state)
        state["mc_cross_sum"] = state["mc_cross_sum"] + probs.mean(axis=1)
        state["mc_cross_cnt"] = state["mc_cross_cnt"] + 1.0
        return probs, state

    def _agg_mask(self, state, selector, row, res):
        n = self.agg_res
        maps = state["mc_cross_sum"][row] / jnp.maximum(state["mc_cross_cnt"], 1.0)
        img = (maps * selector[None, :]).sum(-1).reshape(n, n)
        img = (img - img.min()) / jnp.maximum(img.max() - img.min(), 1e-8)
        return jax.image.resize(img, (res, res), "bilinear").reshape(-1)

    def step_callback(self, latents, tensors, state, step):
        # after_step: reset the per-step aggregation (masactrl.py:225-227)
        state = dict(state)
        state["mc_cross_sum"] = jnp.zeros_like(state["mc_cross_sum"])
        state["mc_cross_cnt"] = jnp.zeros_like(state["mc_cross_cnt"])
        return latents, state

    def attention_override(self, site, q, k, v, scale, tensors, state, step):
        if site.is_cross or site.index < self.spec.start_layer:
            return None
        B = q.shape[0] // 2
        res = site.resolution
        have_maps = state["mc_cross_cnt"] > 0
        # source masks from the source rows (mask[-2] == cond source row B)
        mask_s = self._agg_mask(state, tensors["ref_token_mask"], B, res)
        mask_t = self._agg_mask(state, tensors["cur_token_mask"],
                                2 * B - 1, res)
        mask_s = jnp.where(mask_s >= self.thres, 1.0, 0.0)
        mask_t = jnp.where(mask_t >= self.thres, 1.0, 0.0)
        active = (step >= self.spec.start_step)

        def half(lo):
            k_s, v_s = k[lo], v[lo]
            src_probs = jax.nn.softmax(
                jnp.einsum("hqd,hkd->hqk", q[lo], k_s,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.float32) * scale, -1)
            out_src = jnp.einsum("hqk,hkd->hqd", src_probs,
                                 v_s.astype(jnp.float32)).astype(q.dtype)
            masked = _masked_fg_bg_attention(q[lo + B - 1], k_s, v_s, scale,
                                             mask_s, mask_t)
            plain_probs = jax.nn.softmax(
                jnp.einsum("hqd,hkd->hqk", q[lo + B - 1], k_s,
                           preferred_element_type=jnp.float32
                           ).astype(jnp.float32) * scale, -1)
            plain_tgt = jnp.einsum("hqk,hkd->hqd", plain_probs,
                                   v_s.astype(jnp.float32)).astype(q.dtype)
            out_tgt = jnp.where(have_maps, masked, plain_tgt)
            return out_src, out_tgt

        ou_s, ou_t = half(0)
        oc_s, oc_t = half(B)
        out = jnp.stack([ou_s, ou_t, oc_s, oc_t], axis=0)

        plain_probs = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32).astype(jnp.float32) * scale, -1)
        plain = jnp.einsum("bhqk,bhkd->bhqd", plain_probs,
                           v.astype(jnp.float32)).astype(q.dtype)
        return jnp.where(active, out, plain), state


class MasaCtrlControl(BaseControl):
    def __init__(self, spec: MasaCtrlSpec):
        self.spec = spec

    def qkv_hook(self, site: AttnSite, q, k, v, tensors, state, step):
        if site.is_cross or site.index < self.spec.start_layer:
            return q, k, v
        B = k.shape[0] // 2
        active = step >= self.spec.start_step

        def half_lead(x, lo):
            return jnp.broadcast_to(x[lo : lo + 1], (B,) + x.shape[1:])

        if self.spec.union:
            # target rows attend to concat[source K/V, own K/V]; source rows
            # are untouched. Implemented by swapping the source half into a
            # doubled K/V and masking is unnecessary because rows are
            # independent: build per-row K/V = concat(source, own).
            k_src = jnp.concatenate([half_lead(k, 0), half_lead(k, B)], axis=0)
            v_src = jnp.concatenate([half_lead(v, 0), half_lead(v, B)], axis=0)
            k_new = jnp.concatenate([k_src, k], axis=2)  # (2B, H, 2S, D)
            v_new = jnp.concatenate([v_src, v], axis=2)
            # source rows should attend only to themselves: give them their
            # own K/V twice (attention over duplicated keys == original probs)
            dup_k = jnp.concatenate([k, k], axis=2)
            dup_v = jnp.concatenate([v, v], axis=2)
            row_is_src = jnp.arange(k.shape[0]) % B == 0
            sel = row_is_src[:, None, None, None]
            k_new = jnp.where(sel, dup_k, k_new)
            v_new = jnp.where(sel, dup_v, v_new)
            k_out = jnp.where(active, k_new, dup_k)
            v_out = jnp.where(active, v_new, dup_v)
            return q, k_out, v_out

        k_lead = jnp.concatenate([half_lead(k, 0), half_lead(k, B)], axis=0)
        v_lead = jnp.concatenate([half_lead(v, 0), half_lead(v, B)], axis=0)
        k = jnp.where(active, k_lead, k)
        v = jnp.where(active, v_lead, v)
        return q, k, v
