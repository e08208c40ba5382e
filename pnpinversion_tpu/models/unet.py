"""Functional SD-style UNet2DCondition with an explicit attention-control
dispatch point.

Architecture parity: HF diffusers ``UNet2DConditionModel`` as instantiated by
"CompVis/stable-diffusion-v1-4" (the model every P2P-family editor in the
reference loads, /root/reference/models/p2p_editor.py:18-25): 4 down blocks
(cross-attn x3 + plain), cross-attn mid block, 4 mirrored up blocks,
(320,640,1280,1280) channels, 2 layers/block, 8 heads, 768-dim context.

TPU-first design choices:
- NHWC activations / HWIO conv kernels;
- a single pure ``unet_apply`` traced once per control spec; the 50-step
  loops `lax.scan` over it;
- every attention call is routed through ``controlled_attention`` with a
  static ``AttnSite`` (replaces the reference's runtime monkey-patching,
  attention_control.py:12-81);
- optional ``resnet_hook`` on decoder resnets (PnP feature injection,
  run_editing_pnp.py:239-294).
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from pnpinversion_tpu.configs import UNetConfig
from pnpinversion_tpu.control.base import AttnSite, BaseControl, NO_CONTROL
from pnpinversion_tpu.models.layers import (
    conv2d,
    group_norm,
    init_conv,
    init_linear,
    init_norm,
    layer_norm,
    linear,
    nearest_upsample_2x,
    silu,
    timestep_embedding,
)
from pnpinversion_tpu.ops.attention import controlled_attention

Array = jax.Array
Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# site enumeration
# ---------------------------------------------------------------------------

def enumerate_sites(config: UNetConfig) -> List[Tuple[AttnSite, AttnSite]]:
    """(self_site, cross_site) per transformer block, in execution order."""
    n = len(config.block_out_channels)
    sites: List[Tuple[AttnSite, AttnSite]] = []
    index = 0
    # per-(place, kind) counters for ≤32²-store ordering (ref attention_control.py:221-225)
    store_counts: Dict[Tuple[str, bool], int] = {}
    # LocalBlend slots: coarsest cross-attn down block + coarsest cross-attn up block
    down_attn_res = [config.sample_size // (2**i) for i in range(n) if config.cross_attention[i]]
    lb_res = min(down_attn_res) if down_attn_res else -1
    lb_counter = [0]

    def mk(place: str, res: int, channels: int) -> Tuple[AttnSite, AttnSite]:
        nonlocal index
        pair = []
        for is_cross in (False, True):
            key = (place, is_cross)
            store_threshold = 32 * 32
            if res * res <= store_threshold:
                pidx = store_counts.get(key, 0)
                store_counts[key] = pidx + 1
            else:
                pidx = -1
            lb_slot = -1
            if is_cross and res == lb_res and place in ("down", "up"):
                lb_slot = lb_counter[0]
                lb_counter[0] += 1
            pair.append(
                AttnSite(
                    index=index,
                    place=place,
                    resolution=res,
                    is_cross=is_cross,
                    heads=config.heads_at(channels),
                    place_index=pidx,
                    lb_slot=lb_slot,
                )
            )
        index += 1
        return tuple(pair)  # type: ignore[return-value]

    for i in range(n):
        if config.cross_attention[i]:
            res = config.sample_size // (2**i)
            for _ in range(config.layers_per_block):
                sites.append(mk("down", res, config.block_out_channels[i]))
    sites.append(mk("mid", config.sample_size // (2 ** (n - 1)),
                    config.block_out_channels[-1]))
    for i in range(n):
        j = n - 1 - i  # mirrored down-block index
        if config.cross_attention[j]:
            res = config.sample_size // (2**j)
            for _ in range(config.layers_per_block + 1):
                sites.append(mk("up", res, config.block_out_channels[j]))
    return sites


def num_lb_slots(config: UNetConfig) -> int:
    return sum(
        1 for pair in enumerate_sites(config) for s in pair if s.is_cross and s.lb_slot >= 0
    )


def lb_resolution(config: UNetConfig) -> int:
    for pair in enumerate_sites(config):
        for s in pair:
            if s.lb_slot >= 0:
                return s.resolution
    return -1


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def _init_resnet(key, in_ch: int, out_ch: int, temb_dim: Optional[int], groups: int) -> Params:
    ks = jax.random.split(key, 4)
    p: Params = {
        "norm1": init_norm(in_ch),
        "conv1": init_conv(ks[0], in_ch, out_ch, 3),
        "norm2": init_norm(out_ch),
        "conv2": init_conv(ks[1], out_ch, out_ch, 3),
    }
    if temb_dim is not None:
        p["time_emb_proj"] = init_linear(ks[2], temb_dim, out_ch)
    if in_ch != out_ch:
        p["conv_shortcut"] = init_conv(ks[3], in_ch, out_ch, 1)
    return p


def _init_attention(key, query_dim: int, context_dim: Optional[int]) -> Params:
    ks = jax.random.split(key, 4)
    kv_dim = context_dim if context_dim is not None else query_dim
    return {
        "to_q": init_linear(ks[0], query_dim, query_dim, use_bias=False),
        "to_k": init_linear(ks[1], kv_dim, query_dim, use_bias=False),
        "to_v": init_linear(ks[2], kv_dim, query_dim, use_bias=False),
        "to_out": init_linear(ks[3], query_dim, query_dim),
    }


def _init_transformer_block(key, dim: int, context_dim: int) -> Params:
    ks = jax.random.split(key, 4)
    return {
        "norm1": init_norm(dim),
        "attn1": _init_attention(ks[0], dim, None),
        "norm2": init_norm(dim),
        "attn2": _init_attention(ks[1], dim, context_dim),
        "norm3": init_norm(dim),
        "ff": {
            "geglu": init_linear(ks[2], dim, dim * 8),
            "out": init_linear(ks[3], dim * 4, dim),
        },
    }


def _init_transformer2d(key, dim: int, context_dim: int) -> Params:
    ks = jax.random.split(key, 3)
    return {
        "norm": init_norm(dim),
        "proj_in": init_conv(ks[0], dim, dim, 1),
        "blocks": [_init_transformer_block(ks[1], dim, context_dim)],
        "proj_out": init_conv(ks[2], dim, dim, 1),
    }


def init_unet_params(key, config: UNetConfig = UNetConfig(), zeros: bool = False) -> Params:
    """Random (or zero) init with the SD1.4 parameter tree layout."""
    if zeros:
        shapes = jax.eval_shape(lambda k: init_unet_params(k, config), key)
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), shapes)

    chs = config.block_out_channels
    temb_dim = config.time_embed_dim
    groups = config.norm_groups
    n = len(chs)
    keys = iter(jax.random.split(key, 1024))

    params: Params = {
        "time_embedding": {
            "linear_1": init_linear(next(keys), chs[0], temb_dim),
            "linear_2": init_linear(next(keys), temb_dim, temb_dim),
        },
        "conv_in": init_conv(next(keys), config.in_channels, chs[0], 3),
        "conv_norm_out": init_norm(chs[0]),
        "conv_out": init_conv(next(keys), chs[0], config.out_channels, 3),
    }

    down_blocks = []
    out_ch = chs[0]
    for i in range(n):
        in_ch, out_ch = out_ch, chs[i]
        block: Params = {"resnets": [], "attentions": []}
        for j in range(config.layers_per_block):
            block["resnets"].append(
                _init_resnet(next(keys), in_ch if j == 0 else out_ch, out_ch, temb_dim, groups)
            )
            if config.cross_attention[i]:
                block["attentions"].append(
                    _init_transformer2d(next(keys), out_ch, config.context_dim)
                )
        if i < n - 1:
            block["downsample"] = init_conv(next(keys), out_ch, out_ch, 3)
        down_blocks.append(block)
    params["down_blocks"] = down_blocks

    mid_ch = chs[-1]
    params["mid_block"] = {
        "resnets": [
            _init_resnet(next(keys), mid_ch, mid_ch, temb_dim, groups),
            _init_resnet(next(keys), mid_ch, mid_ch, temb_dim, groups),
        ],
        "attentions": [_init_transformer2d(next(keys), mid_ch, config.context_dim)],
    }

    up_blocks = []
    rev = list(reversed(chs))
    prev_out = rev[0]
    for i in range(n):
        out_ch_u = rev[i]
        in_ch_u = rev[min(i + 1, n - 1)]
        block = {"resnets": [], "attentions": []}
        down_idx = n - 1 - i
        for j in range(config.layers_per_block + 1):
            skip_ch = in_ch_u if j == config.layers_per_block else out_ch_u
            res_in = prev_out if j == 0 else out_ch_u
            block["resnets"].append(
                _init_resnet(next(keys), res_in + skip_ch, out_ch_u, temb_dim, groups)
            )
            if config.cross_attention[down_idx]:
                block["attentions"].append(
                    _init_transformer2d(next(keys), out_ch_u, config.context_dim)
                )
        if i < n - 1:
            block["upsample"] = init_conv(next(keys), out_ch_u, out_ch_u, 3)
        up_blocks.append(block)
        prev_out = out_ch_u
    params["up_blocks"] = up_blocks
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------

def _resnet(p: Params, x: Array, temb: Optional[Array], groups: int, hook=None) -> Array:
    h = group_norm(p["norm1"], x, groups)
    h = conv2d(p["conv1"], silu(h))
    if temb is not None and "time_emb_proj" in p:
        t = linear(p["time_emb_proj"], silu(temb))
        h = h + t[:, None, None, :]
    h = group_norm(p["norm2"], h, groups)
    h = conv2d(p["conv2"], silu(h))
    if hook is not None:
        # PnP-style feature injection happens on the residual branch BEFORE
        # the shortcut add (run_editing_pnp.py:276-281)
        h = hook(h)
    if "conv_shortcut" in p:
        x = conv2d(p["conv_shortcut"], x)
    return x + h


def _geglu_ff(p: Params, x: Array) -> Array:
    h = linear(p["geglu"], x)
    h, gate = jnp.split(h, 2, axis=-1)
    return linear(p["out"], h * jax.nn.gelu(gate, approximate=False))


def _transformer2d(
    p: Params,
    x: Array,
    context: Array,
    sites: Tuple[AttnSite, AttnSite],
    groups: int,
    control: BaseControl,
    tensors,
    state,
    step,
) -> Tuple[Array, dict]:
    b, h, w, c = x.shape
    residual = x
    hs = group_norm(p["norm"], x, groups, eps=1e-6)
    hs = conv2d(p["proj_in"], hs)
    hs = hs.reshape(b, h * w, c)
    self_site, cross_site = sites
    for blk in p["blocks"]:
        attn_out, state = controlled_attention(
            blk["attn1"], layer_norm(blk["norm1"], hs), None, self_site,
            control, tensors, state, step,
        )
        hs = hs + attn_out
        attn_out, state = controlled_attention(
            blk["attn2"], layer_norm(blk["norm2"], hs), context, cross_site,
            control, tensors, state, step,
        )
        hs = hs + attn_out
        hs = hs + _geglu_ff(blk["ff"], layer_norm(blk["norm3"], hs))
    hs = hs.reshape(b, h, w, c)
    hs = conv2d(p["proj_out"], hs)
    return hs + residual, state


def unet_apply(
    params: Params,
    x: Array,
    t: Array,
    context: Array,
    config: UNetConfig = UNetConfig(),
    control: BaseControl = NO_CONTROL,
    tensors=None,
    state=None,
    step: Optional[Array] = None,
) -> Tuple[Array, dict]:
    """Predict noise eps(x_t, t, context). x: (B, H, W, C_in) NHWC.

    Returns (eps, control_state). With ``NO_CONTROL`` the state is {}.
    """
    groups = config.norm_groups
    n = len(config.block_out_channels)
    sites = enumerate_sites(config)
    site_iter = iter(sites)
    if state is None:
        state = {}

    temb = timestep_embedding(
        t, config.block_out_channels[0],
        flip_sin_to_cos=config.flip_sin_to_cos,
        downscale_freq_shift=config.freq_shift,
        dtype=x.dtype,
    )
    if temb.shape[0] == 1 and x.shape[0] > 1:
        temb = jnp.broadcast_to(temb, (x.shape[0], temb.shape[1]))
    temb = linear(params["time_embedding"]["linear_2"],
                  silu(linear(params["time_embedding"]["linear_1"], temb)))

    h = conv2d(params["conv_in"], x)
    residuals: List[Array] = [h]

    for i, block in enumerate(params["down_blocks"]):
        has_attn = config.cross_attention[i]
        for j, rn in enumerate(block["resnets"]):
            h = _resnet(rn, h, temb, groups)
            if has_attn:
                h, state = _transformer2d(
                    block["attentions"][j], h, context, next(site_iter),
                    groups, control, tensors, state, step,
                )
            residuals.append(h)
        if "downsample" in block:
            h = conv2d(block["downsample"], h, stride=2)
            residuals.append(h)

    mid = params["mid_block"]
    h = _resnet(mid["resnets"][0], h, temb, groups)
    h, state = _transformer2d(
        mid["attentions"][0], h, context, next(site_iter), groups, control, tensors, state, step
    )
    h = _resnet(mid["resnets"][1], h, temb, groups)

    for i, block in enumerate(params["up_blocks"]):
        down_idx = n - 1 - i
        has_attn = config.cross_attention[down_idx]
        for j, rn in enumerate(block["resnets"]):
            skip = residuals.pop()
            h = jnp.concatenate([h, skip], axis=-1)
            block_key = f"up_{i}_resnet_{j}"
            h = _resnet(
                rn, h, temb, groups,
                hook=lambda hh, bk=block_key: control.resnet_hook(
                    bk, hh, tensors, state, step),
            )
            if has_attn:
                h, state = _transformer2d(
                    block["attentions"][j], h, context, next(site_iter),
                    groups, control, tensors, state, step,
                )
        if "upsample" in block:
            h = nearest_upsample_2x(h)
            h = conv2d(block["upsample"], h)

    h = group_norm(params["conv_norm_out"], h, groups)
    h = conv2d(params["conv_out"], silu(h))
    return h, state
