"""Cross-attention map capture (pix2pix-zero style).

Replaces /root/reference/models/pix2pix_zero/cross_attention.py:4-57
(MyCrossAttnProcessor storing ``attn.attn_probs`` on every cross-attn module).
Maps go into the control state dict keyed by site index; unlike the reference
(which offloads 50 steps x 16 sites to CPU RAM, edit_pipeline.py:97-101), the
editor recomputes reference maps in-step, so the state only ever holds one
step's maps.
"""
from __future__ import annotations

import jax

from pnpinversion_tpu.control.base import AttnSite, BaseControl

Array = jax.Array


class CrossAttnStoreControl(BaseControl):
    """Stores the softmax probs of every cross-attention site."""

    def needs_probs(self, site: AttnSite) -> bool:
        return site.is_cross

    def probs_hook(self, site, probs, tensors, state, step):
        state = dict(state)
        state[f"xattn_{site.index}"] = probs
        return probs, state
