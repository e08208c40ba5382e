"""The attention-control dispatch protocol.

The reference implements editor control by monkey-patching every
CrossAttention.forward at runtime and driving stateful Python controller
objects (6 independent registries; e.g.
/root/reference/models/p2p/attention_control.py:12-81,
/root/reference/models/masactrl/masactrl_utils.py:79-144,
/root/reference/run_editing_pnp.py:176-294). That idiom cannot survive XLA
tracing. Here, every attention call site in the UNet is annotated with a
static ``AttnSite`` and routed through a ``BaseControl`` object:

- the control object itself is *static* (no arrays; hashable; closed over by
  the jit), so Python branching on sites happens at trace time;
- all per-image arrays (mappers, alpha schedules, equalizers, ...) live in
  ``tensors`` and all mutable state (accumulated maps, ...) in ``state`` —
  both plain pytrees threaded through the `lax.scan` carry;
- the current diffusion step index is a traced int32, so step-dependent
  behavior lowers to `jnp.where` masks instead of Python conditionals.

Hooks (all optional):
- ``qkv_hook``: rewrite per-head q/k/v before attention (MasaCtrl K/V
  source-swap, PnP q/k injection, StyleDiffusion V-swap).
- ``needs_probs``/``probs_hook``: request materialized softmax probs at a
  site and edit/record them (P2P map editing, attention stores).
- ``step_callback``: post-step latent rewrite (LocalBlend, SpatialReplace).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax

Array = jax.Array
Tensors = Dict[str, Any]
State = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class AttnSite:
    """Static metadata for one attention call site in a UNet.

    Attributes:
      index: transformer-block index in execution order (down->mid->up).
      place: 'down' | 'mid' | 'up'.
      resolution: spatial extent (h == w) of the feature map at this site.
      is_cross: True for text cross-attention, False for self-attention.
      heads: number of attention heads.
      place_index: index of this site within the ≤32² store list of its
        (place, is_cross) bucket — mirrors the reference AttentionStore list
        ordering (attention_control.py:214-248); -1 when the map is > 32².
      lb_slot: slot in the LocalBlend 16x16 cross-map store, or -1.
    """

    index: int
    place: str
    resolution: int
    is_cross: bool
    heads: int
    place_index: int = -1
    lb_slot: int = -1

    @property
    def seq_len(self) -> int:
        return self.resolution * self.resolution


class BaseControl:
    """No-op base. Subclasses override a subset of hooks.

    Subclasses must stay array-free: anything traced belongs in
    tensors/state. Equality/hash default to identity, which is fine because
    editors construct one control per method spec and jit per control object.
    """

    # -- state ---------------------------------------------------------------
    def init_state(self, batch_size: int, dtype=None, heads: int = 8,
                   max_words: int = 77) -> State:
        return {}

    # -- attention hooks -----------------------------------------------------
    def qkv_hook(
        self,
        site: AttnSite,
        q: Array,
        k: Array,
        v: Array,
        tensors: Tensors,
        state: State,
        step: Array,
    ) -> Tuple[Array, Array, Array]:
        return q, k, v

    def value_context_hook(
        self,
        site: AttnSite,
        context: Array,
        tensors: Tensors,
        state: State,
        step: Array,
    ) -> Array:
        """Rewrite the context used for the V projection only (K keeps the
        original text context) — StyleDiffusion's learned prompt-value
        embedding (/root/reference/models/stylediffusion/utils.py:446-464)."""
        return context

    def attention_override(
        self,
        site: AttnSite,
        q: Array,
        k: Array,
        v: Array,
        scale: float,
        tensors: Tensors,
        state: State,
        step: Array,
    ):
        """Full takeover of one attention site. Return (out, state) with out
        shaped (B, H, Sq, D) to bypass the standard path, or None to proceed
        (MasaCtrl's masked fg/bg variants need two softmaxes per query)."""
        return None

    def needs_probs(self, site: AttnSite) -> bool:
        return False

    def probs_hook(
        self,
        site: AttnSite,
        probs: Array,
        tensors: Tensors,
        state: State,
        step: Array,
    ) -> Tuple[Array, State]:
        return probs, state

    # -- per-step latent hook --------------------------------------------------
    def step_callback(
        self,
        latents: Array,
        tensors: Tensors,
        state: State,
        step: Array,
    ) -> Tuple[Array, State]:
        return latents, state

    # -- residual/feature hook (PnP conv-feature injection) --------------------
    def resnet_hook(
        self,
        block_key: str,
        hidden: Array,
        tensors: Tensors,
        state: State,
        step: Array,
    ) -> Array:
        """Called on decoder resnets' residual-branch activations (after
        conv2, BEFORE the shortcut add — run_editing_pnp.py:276-281)."""
        return hidden


class NoControl(BaseControl):
    pass


NO_CONTROL = NoControl()
