"""StyleDiffusion controls: learned V-context swap + the tau_u-extended P2P
controller, and the 16x16 cross-map capture used for training supervision.

Parity: /root/reference/models/stylediffusion/utils.py:427-531 (patched
cross-attn computing V from the learned embedding), :26-425 (controller stack
with the extra ``uncond_self_replace_steps`` knob; the benchmark runs
tau_u=0.0 which disables it, run_editing_stylediffusion.py:255).
"""
from __future__ import annotations

import dataclasses
import jax
import jax.numpy as jnp

from pnpinversion_tpu.control.base import AttnSite, BaseControl
from pnpinversion_tpu.control.p2p import P2PControl, SELF_EDIT_MAX_SEQ
from pnpinversion_tpu.models.stylediffusion import forward_embed, mapper_at_step

Array = jax.Array


class StyleStoreControl(BaseControl):
    """Capture the 16x16 cross maps (lb sites) of a single-branch call —
    the inversion supervision A*(t) (inversion.py:120-131)."""

    def needs_probs(self, site: AttnSite) -> bool:
        return site.is_cross and site.lb_slot >= 0

    def probs_hook(self, site, probs, tensors, state, step):
        state = dict(state)
        state[f"sd_maps_{site.lb_slot}"] = probs
        return probs, state


@dataclasses.dataclass(frozen=True, eq=True)
class StyleDiffusionSpec:
    """Static edit-phase configuration (taus in steps)."""

    batch_size: int
    num_steps: int
    v_replace_end: int  # int(tau_v * T): target rows mapped while step < this
    uncond_self_start: int = 0
    uncond_self_end: int = 0  # tau_u window (0,0) == disabled


class StyleDiffusionControl(BaseControl):
    """Wraps a P2P edit controller, adding the V-context mapping and the
    uncond self-replace window.

    tensors must provide: 'img_tokens' (1,197,768), 'sd_mapper' (stacked
    per-step mapper params), plus the wrapped P2P tensors.
    Batch rows: [uncond x B, cond x B]; cond source row is always mapped at
    the current step, cond target rows only while step < v_replace_end
    (utils.py:455-464 with trainer.I/i).
    """

    def __init__(self, spec: StyleDiffusionSpec, p2p: "P2PControl | None" = None):
        self.spec = spec
        self.p2p = p2p

    def init_state(self, batch_size, dtype=None, heads: int = 8, max_words: int = 77):
        if self.p2p is None:
            return {}
        return self.p2p.init_state(batch_size, dtype, heads, max_words)

    def value_context_hook(self, site, context, tensors, state, step):
        if not site.is_cross:
            return context
        B = self.spec.batch_size
        img = tensors["img_tokens"]
        mp = mapper_at_step(tensors["sd_mapper"], step)
        cond = context[B:]
        mapped = forward_embed(mp, cond, img)
        active_t = step < self.spec.v_replace_end
        # source row always mapped; target rows gated by tau_v
        gate = jnp.concatenate([
            jnp.ones((1,), bool), jnp.full((B - 1,), True) & active_t
        ]) if B > 1 else jnp.ones((1,), bool)
        cond_new = jnp.where(gate[:, None, None], mapped, cond)
        return jnp.concatenate([context[:B], cond_new], axis=0)

    def _uncond_window(self) -> bool:
        return self.spec.uncond_self_end > self.spec.uncond_self_start

    def needs_probs(self, site: AttnSite) -> bool:
        if not site.is_cross:
            # self edits: probs path only when the tau_u window needs the
            # uncond half too; otherwise attention_override handles them
            return self._uncond_window() and site.seq_len <= SELF_EDIT_MAX_SEQ
        return self.p2p.needs_probs(site) if self.p2p is not None else False

    def attention_override(self, site, q, k, v, scale, tensors, state, step):
        if site.is_cross or self.p2p is None or self._uncond_window():
            return None
        return self.p2p.attention_override(site, q, k, v, scale, tensors, state, step)

    def probs_hook(self, site, probs, tensors, state, step):
        if self.p2p is not None:
            probs, state = self.p2p.probs_hook(site, probs, tensors, state, step)
        s = self.spec
        if (not site.is_cross and site.seq_len <= SELF_EDIT_MAX_SEQ
                and s.uncond_self_end > s.uncond_self_start):
            B = s.batch_size
            in_window = (step >= s.uncond_self_start) & (step < s.uncond_self_end)
            base = probs[0]
            repl = probs[1:B]
            new = jnp.where(in_window, jnp.broadcast_to(base[None], repl.shape), repl)
            probs = jnp.concatenate([probs[:1], new, probs[B:]], axis=0)
        return probs, state

    def step_callback(self, latents, tensors, state, step):
        if self.p2p is None:
            return latents, state
        return self.p2p.step_callback(latents, tensors, state, step)


class StyleTrainControl(StyleStoreControl):
    """Training-phase control: V-mapping with a FIXED step's mapper (the one
    being optimized), plus 16x16 map capture.

    map_rows: 'all' for single-branch cond calls; 'cond_half' maps only the
    second half of a [uncond; cond] batch (the trajectory-advance call).
    """

    def __init__(self, map_rows: str = "all"):
        self.map_rows = map_rows

    def value_context_hook(self, site, context, tensors, state, step):
        if not site.is_cross:
            return context
        if self.map_rows == "cond_half":
            B = context.shape[0] // 2
            cond = context[B:]
            mapped = forward_embed(tensors["sd_mapper_i"], cond, tensors["img_tokens"])
            return jnp.concatenate([context[:B], mapped], axis=0)
        return forward_embed(tensors["sd_mapper_i"], context, tensors["img_tokens"])
