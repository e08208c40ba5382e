"""One-time HF checkpoint -> param-tree converter.

Maps diffusers (UNet2DConditionModel / AutoencoderKL) and transformers
(CLIPTextModel) state dicts onto the trees built by init_unet_params /
init_vae_params / init_clip_text_params. Conventions: torch Linear weights
(out,in) -> kernel (in,out); torch Conv2d (out,in,kh,kw) -> HWIO.

Reads ``*.safetensors`` (preferred) or ``pytorch_model.bin``/
``diffusion_pytorch_model.bin`` from a local HF-format model directory
(zero-egress environment: the user supplies the files).
"""
from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np

from pnpinversion_tpu.configs import CLIPTextConfig, UNetConfig, VAEConfig


def load_state_dict(model_dir: str) -> Dict[str, np.ndarray]:
    files = sorted(os.listdir(model_dir))
    st = [f for f in files if f.endswith(".safetensors")]
    if st:
        from safetensors.numpy import load_file

        out: Dict[str, np.ndarray] = {}
        for f in st:
            out.update(load_file(os.path.join(model_dir, f)))
        return out
    bins = [f for f in files if f.endswith(".bin") or f.endswith(".ckpt") or f.endswith(".pt")]
    if bins:
        import torch

        out = {}
        for f in bins:
            sd = torch.load(os.path.join(model_dir, f), map_location="cpu",
                            weights_only=True)
            if "state_dict" in sd:
                sd = sd["state_dict"]
            out.update({k: v.float().numpy() for k, v in sd.items()})
        return out
    raise FileNotFoundError(f"no weight files in {model_dir}")


def _linear(sd, name):
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _conv(sd, name):
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _attention(sd, base, old_style: bool = False):
    """diffusers CrossAttention: to_q/k/v (no bias) + to_out.0."""
    if old_style:
        return {
            "to_q": _linear(sd, f"{base}.to_q"),
            "to_k": _linear(sd, f"{base}.to_k"),
            "to_v": _linear(sd, f"{base}.to_v"),
            "to_out": _linear(sd, f"{base}.to_out.0"),
        }
    return {
        "to_q": _linear(sd, f"{base}.to_q"),
        "to_k": _linear(sd, f"{base}.to_k"),
        "to_v": _linear(sd, f"{base}.to_v"),
        "to_out": _linear(sd, f"{base}.to_out.0"),
    }


def _resnet(sd, base, with_time: bool = True):
    p = {
        "norm1": _norm(sd, f"{base}.norm1"),
        "conv1": _conv(sd, f"{base}.conv1"),
        "norm2": _norm(sd, f"{base}.norm2"),
        "conv2": _conv(sd, f"{base}.conv2"),
    }
    if with_time and f"{base}.time_emb_proj.weight" in sd:
        p["time_emb_proj"] = _linear(sd, f"{base}.time_emb_proj")
    if f"{base}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _conv(sd, f"{base}.conv_shortcut")
    return p


def _transformer2d(sd, base):
    blocks = []
    i = 0
    while f"{base}.transformer_blocks.{i}.norm1.weight" in sd:
        tb = f"{base}.transformer_blocks.{i}"
        blocks.append({
            "norm1": _norm(sd, f"{tb}.norm1"),
            "attn1": _attention(sd, f"{tb}.attn1"),
            "norm2": _norm(sd, f"{tb}.norm2"),
            "attn2": _attention(sd, f"{tb}.attn2"),
            "norm3": _norm(sd, f"{tb}.norm3"),
            "ff": {
                "geglu": _linear(sd, f"{tb}.ff.net.0.proj"),
                "out": _linear(sd, f"{tb}.ff.net.2"),
            },
        })
        i += 1
    return {
        "norm": _norm(sd, f"{base}.norm"),
        "proj_in": _conv(sd, f"{base}.proj_in"),
        "blocks": blocks,
        "proj_out": _conv(sd, f"{base}.proj_out"),
    }


def convert_unet(sd: Dict[str, np.ndarray], config: UNetConfig = UNetConfig()) -> Dict[str, Any]:
    n = len(config.block_out_channels)
    params: Dict[str, Any] = {
        "time_embedding": {
            "linear_1": _linear(sd, "time_embedding.linear_1"),
            "linear_2": _linear(sd, "time_embedding.linear_2"),
        },
        "conv_in": _conv(sd, "conv_in"),
        "conv_norm_out": _norm(sd, "conv_norm_out"),
        "conv_out": _conv(sd, "conv_out"),
    }
    down = []
    for i in range(n):
        blk: Dict[str, Any] = {"resnets": [], "attentions": []}
        for j in range(config.layers_per_block):
            blk["resnets"].append(_resnet(sd, f"down_blocks.{i}.resnets.{j}"))
            if config.cross_attention[i]:
                blk["attentions"].append(
                    _transformer2d(sd, f"down_blocks.{i}.attentions.{j}"))
        if f"down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv(sd, f"down_blocks.{i}.downsamplers.0.conv")
        down.append(blk)
    params["down_blocks"] = down

    params["mid_block"] = {
        "resnets": [_resnet(sd, "mid_block.resnets.0"),
                    _resnet(sd, "mid_block.resnets.1")],
        "attentions": [_transformer2d(sd, "mid_block.attentions.0")],
    }

    up = []
    for i in range(n):
        down_idx = n - 1 - i
        blk = {"resnets": [], "attentions": []}
        for j in range(config.layers_per_block + 1):
            blk["resnets"].append(_resnet(sd, f"up_blocks.{i}.resnets.{j}"))
            if config.cross_attention[down_idx]:
                blk["attentions"].append(
                    _transformer2d(sd, f"up_blocks.{i}.attentions.{j}"))
        if f"up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv(sd, f"up_blocks.{i}.upsamplers.0.conv")
        up.append(blk)
    params["up_blocks"] = up
    return params


def _vae_attn(sd, base):
    # diffusers >=0.15 names: group_norm + to_q/k/v/to_out.0;
    # older: query/key/value/proj_attn
    if f"{base}.to_q.weight" in sd:
        return {
            "group_norm": _norm(sd, f"{base}.group_norm"),
            "to_q": _linear(sd, f"{base}.to_q"),
            "to_k": _linear(sd, f"{base}.to_k"),
            "to_v": _linear(sd, f"{base}.to_v"),
            "to_out": _linear(sd, f"{base}.to_out.0"),
        }
    return {
        "group_norm": _norm(sd, f"{base}.group_norm"),
        "to_q": _linear(sd, f"{base}.query"),
        "to_k": _linear(sd, f"{base}.key"),
        "to_v": _linear(sd, f"{base}.value"),
        "to_out": _linear(sd, f"{base}.proj_attn"),
    }


def convert_vae(sd: Dict[str, np.ndarray], config: VAEConfig = VAEConfig()) -> Dict[str, Any]:
    n = len(config.block_out_channels)
    enc: Dict[str, Any] = {"conv_in": _conv(sd, "encoder.conv_in")}
    blocks = []
    for i in range(n):
        blk = {"resnets": [
            _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", with_time=False)
            for j in range(config.layers_per_block)
        ]}
        if f"encoder.down_blocks.{i}.downsamplers.0.conv.weight" in sd:
            blk["downsample"] = _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
        blocks.append(blk)
    enc["down_blocks"] = blocks
    enc["mid"] = {
        "resnet_1": _resnet(sd, "encoder.mid_block.resnets.0", with_time=False),
        "attn": _vae_attn(sd, "encoder.mid_block.attentions.0"),
        "resnet_2": _resnet(sd, "encoder.mid_block.resnets.1", with_time=False),
    }
    enc["norm_out"] = _norm(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Dict[str, Any] = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid"] = {
        "resnet_1": _resnet(sd, "decoder.mid_block.resnets.0", with_time=False),
        "attn": _vae_attn(sd, "decoder.mid_block.attentions.0"),
        "resnet_2": _resnet(sd, "decoder.mid_block.resnets.1", with_time=False),
    }
    ublocks = []
    for i in range(n):
        blk = {"resnets": [
            _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", with_time=False)
            for j in range(config.layers_per_block + 1)
        ]}
        if f"decoder.up_blocks.{i}.upsamplers.0.conv.weight" in sd:
            blk["upsample"] = _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
        ublocks.append(blk)
    dec["up_blocks"] = ublocks
    dec["norm_out"] = _norm(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def convert_clip_text(sd: Dict[str, np.ndarray],
                      config: CLIPTextConfig = CLIPTextConfig()) -> Dict[str, Any]:
    pre = "text_model." if any(k.startswith("text_model.") for k in sd) else ""
    params: Dict[str, Any] = {
        "token_embedding": sd[f"{pre}embeddings.token_embedding.weight"],
        "position_embedding": sd[f"{pre}embeddings.position_embedding.weight"],
        "final_layer_norm": _norm(sd, f"{pre}final_layer_norm"),
        "layers": [],
    }
    for i in range(config.layers):
        base = f"{pre}encoder.layers.{i}"
        params["layers"].append({
            "layer_norm1": _norm(sd, f"{base}.layer_norm1"),
            "q_proj": _linear(sd, f"{base}.self_attn.q_proj"),
            "k_proj": _linear(sd, f"{base}.self_attn.k_proj"),
            "v_proj": _linear(sd, f"{base}.self_attn.v_proj"),
            "out_proj": _linear(sd, f"{base}.self_attn.out_proj"),
            "layer_norm2": _norm(sd, f"{base}.layer_norm2"),
            "fc1": _linear(sd, f"{base}.mlp.fc1"),
            "fc2": _linear(sd, f"{base}.mlp.fc2"),
        })
    return params
