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
