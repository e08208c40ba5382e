"""Plug-and-Play (PnP) feature & self-attention injection, traced.

Replaces /root/reference/run_editing_pnp.py:159-294:
- q/k source-injection on the self-attention of decoder transformer blocks
  4-11 (up_blocks res_dict {1:[1,2], 2:[0,1,2], 3:[0,1,2]}, :231-235) while
  the step is within the first ``qk_t`` steps of the schedule;
- residual-branch feature injection on up_blocks[1].resnets[1] (:239-294)
  within the first ``conv_t`` steps.

Batch layout (run_editing_pnp.py:353-361): 3 rows
[source_noisy_latent, x_uncond, x_cond] — rows 1 and 2 receive the source
row's q/k (own v) and conv features.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from pnpinversion_tpu.configs import UNetConfig
from pnpinversion_tpu.control.base import AttnSite, BaseControl
from pnpinversion_tpu.models.unet import enumerate_sites

Array = jax.Array


def pnp_injection_sites(config: UNetConfig) -> Tuple[int, ...]:
    """Self-attn transformer-block indices to inject: all decoder attention
    blocks except the first one of the coarsest decoder level (:231)."""
    sites = enumerate_sites(config)
    up_self = [s for pair in sites for s in pair if s.place == "up" and not s.is_cross]
    return tuple(s.index for s in up_self[1:])


@dataclasses.dataclass(frozen=True, eq=True)
class PnPSpec:
    qk_t: int  # number of leading steps with q/k injection (int(0.5 * T))
    conv_t: int  # number of leading steps with conv injection (int(0.8 * T))
    sites: Tuple[int, ...]  # static injection site indices
    conv_block_key: str = "up_1_resnet_1"


class PnPControl(BaseControl):
    def __init__(self, spec: PnPSpec):
        self.spec = spec

    def qkv_hook(self, site: AttnSite, q, k, v, tensors, state, step):
        if site.is_cross or site.index not in self.spec.sites:
            return q, k, v
        active = step < self.spec.qk_t
        src_q = jnp.broadcast_to(q[:1], q.shape)
        src_k = jnp.broadcast_to(k[:1], k.shape)
        q = jnp.where(active, src_q, q)
        k = jnp.where(active, src_k, k)
        return q, k, v

    def resnet_hook(self, block_key, hidden, tensors, state, step):
        if block_key != self.spec.conv_block_key:
            return hidden
        active = step < self.spec.conv_t
        src = jnp.broadcast_to(hidden[:1], hidden.shape)
        return jnp.where(active, src, hidden)


def make_pnp_control(config: UNetConfig, num_steps: int = 50,
                     pnp_f_t: float = 0.8, pnp_attn_t: float = 0.5) -> PnPControl:
    return PnPControl(PnPSpec(
        qk_t=int(num_steps * pnp_attn_t),
        conv_t=int(num_steps * pnp_f_t),
        sites=pnp_injection_sites(config),
    ))
