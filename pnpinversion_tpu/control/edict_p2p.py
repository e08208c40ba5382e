"""EDICT's P2P-style attention takeover, traced.

Parity: /root/reference/models/edict/edict_functions.py:208-327. The
reference runs three sequential batch-1 UNet calls per update (uncond /
base-cond saving every attention map / edit-cond consuming them). Saving the
64x64 self-attention maps costs ~0.5GB per site; instead we run ONE batch-3
call [uncond, base-cond, edit-cond] on the same latent and edit in-batch:

- self-attn (attn1): full takeover ``attn_edit = attn_base`` (:268-270 with
  mask None) == giving the edit row the base row's q AND k — a qkv rewrite,
  so the fused attention path survives.
- cross-attn (attn2): token-wise splice
  ``attn*(1-mask) + attn_base[..., indices]*mask`` (:264-267), where
  mask/indices come from a SequenceMatcher alignment of the two token
  sequences (init_attention_edit, :225-241).

Default schedules (spatial/tokens start 0.0, end 1.0) make both takeovers
active at every step, so no step gating is required; token re-weighting
(init_attention_weights) defaults to all-ones and is folded in as optional.
"""
from __future__ import annotations

from difflib import SequenceMatcher
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from pnpinversion_tpu.control.base import AttnSite, BaseControl

Array = jax.Array


class EdictP2PControl(BaseControl):
    """Batch rows: [uncond, base-cond, edit-cond]."""

    def __init__(self, num_steps: int = 50,
                 tokens_start: float = 0.0, tokens_end: float = 1.0,
                 spatial_start: float = 0.0, spatial_end: float = 1.0):
        self.num_steps = num_steps
        self.tokens_window = (tokens_start, tokens_end)
        self.spatial_window = (spatial_start, spatial_end)

    def qkv_hook(self, site: AttnSite, q, k, v, tensors, state, step):
        if site.is_cross:
            return q, k, v
        # self-attn full takeover: edit row gets base row's q and k
        q = q.at[2].set(q[1])
        k = k.at[2].set(k[1])
        return q, k, v

    def needs_probs(self, site: AttnSite) -> bool:
        return site.is_cross

    def probs_hook(self, site, probs, tensors, state, step):
        mask = tensors["edit_mask"]  # (77,)
        indices = tensors["edit_indices"]  # (77,) int32
        base = probs[1]
        spliced = jnp.take(base, indices, axis=-1)
        edited = probs[2] * (1.0 - mask) + spliced * mask
        if "token_weights" in tensors:
            edited = edited * tensors["token_weights"]
        return probs.at[2].set(edited), state


def make_edict_p2p_tensors(prompt_base: str, prompt_edit: str, tokenizer,
                           max_length: int = 77) -> Dict[str, Array]:
    """SequenceMatcher alignment of base/edit token ids
    (init_attention_edit, edict_functions.py:225-241)."""
    def pad(ids):
        ids = ids[:max_length]
        return ids + [tokenizer.pad_token_id] * (max_length - len(ids))

    tokens = np.asarray(pad(tokenizer.encode(prompt_base)))
    tokens_edit = np.asarray(pad(tokenizer.encode(prompt_edit)))
    mask = np.zeros(max_length, dtype=np.float32)
    indices = np.zeros(max_length, dtype=np.int64)
    target = np.arange(max_length, dtype=np.int64)
    for name, a0, a1, b0, b1 in SequenceMatcher(
            None, tokens.tolist(), tokens_edit.tolist()).get_opcodes():
        if b0 < max_length:
            if name == "equal" or (name == "replace" and a1 - a0 == b1 - b0):
                mask[b0:b1] = 1
                indices[b0:b1] = target[a0:a1]
    return {
        "edit_mask": jnp.asarray(mask),
        "edit_indices": jnp.asarray(indices, dtype=jnp.int32),
    }
