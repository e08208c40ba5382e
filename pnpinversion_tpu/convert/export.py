"""Param-tree -> diffusers/transformers-layout state-dict exporters.

The exact inverses of convert/torch_to_jax.py's importers (torch Linear
(out,in) <- kernel (in,out); Conv2d OIHW <- HWIO). Two uses:

1. Synthetic-checkpoint tests: prove the importers consume EVERY key of a
   full SD1.4-shaped checkpoint and fill EVERY param leaf
   (tests/test_convert.py) — the weight-day derisking VERDICT.md asked for.
2. Exporting edited/fine-tuned weights back to HF format for downstream
   torch tooling.

Key sets mirror diffusers UNet2DConditionModel / AutoencoderKL and
transformers CLIPTextModel naming for the SD1.x/2.x architectures
(cross-checked against the importers; CLIP names oracle-verified against a
real transformers state dict in tests/test_convert.py).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from pnpinversion_tpu.configs import CLIPTextConfig, UNetConfig, VAEConfig


class TrackingDict(dict):
    """A state dict that records which keys were read (not just probed)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.accessed = set()

    def __getitem__(self, key):
        self.accessed.add(key)
        return super().__getitem__(key)

    def unread_keys(self):
        return set(self.keys()) - self.accessed


def _lin(sd, name, p):
    sd[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    if "bias" in p:
        sd[f"{name}.bias"] = np.asarray(p["bias"])


def _conv(sd, name, p):
    sd[f"{name}.weight"] = np.ascontiguousarray(
        np.asarray(p["kernel"]).transpose(3, 2, 0, 1))
    if "bias" in p:
        sd[f"{name}.bias"] = np.asarray(p["bias"])


def _norm(sd, name, p):
    sd[f"{name}.weight"] = np.asarray(p["scale"])
    sd[f"{name}.bias"] = np.asarray(p["bias"])


def _resnet(sd, name, p):
    _norm(sd, f"{name}.norm1", p["norm1"])
    _conv(sd, f"{name}.conv1", p["conv1"])
    _norm(sd, f"{name}.norm2", p["norm2"])
    _conv(sd, f"{name}.conv2", p["conv2"])
    if "time_emb_proj" in p:
        _lin(sd, f"{name}.time_emb_proj", p["time_emb_proj"])
    if "conv_shortcut" in p:
        _conv(sd, f"{name}.conv_shortcut", p["conv_shortcut"])


def _attn(sd, name, p):
    _lin(sd, f"{name}.to_q", p["to_q"])
    _lin(sd, f"{name}.to_k", p["to_k"])
    _lin(sd, f"{name}.to_v", p["to_v"])
    _lin(sd, f"{name}.to_out.0", p["to_out"])


def _transformer(sd, name, p):
    _norm(sd, f"{name}.norm", p["norm"])
    _conv(sd, f"{name}.proj_in", p["proj_in"])
    _conv(sd, f"{name}.proj_out", p["proj_out"])
    for i, blk in enumerate(p["blocks"]):
        tb = f"{name}.transformer_blocks.{i}"
        _norm(sd, f"{tb}.norm1", blk["norm1"])
        _attn(sd, f"{tb}.attn1", blk["attn1"])
        _norm(sd, f"{tb}.norm2", blk["norm2"])
        _attn(sd, f"{tb}.attn2", blk["attn2"])
        _norm(sd, f"{tb}.norm3", blk["norm3"])
        _lin(sd, f"{tb}.ff.net.0.proj", blk["ff"]["geglu"])
        _lin(sd, f"{tb}.ff.net.2", blk["ff"]["out"])


def export_unet(params: Dict[str, Any], config: UNetConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_unet: our tree -> diffusers UNet2DConditionModel
    state dict (the full SD1.x key set for this config)."""
    sd: Dict[str, np.ndarray] = {}
    _lin(sd, "time_embedding.linear_1", params["time_embedding"]["linear_1"])
    _lin(sd, "time_embedding.linear_2", params["time_embedding"]["linear_2"])
    _conv(sd, "conv_in", params["conv_in"])
    _norm(sd, "conv_norm_out", params["conv_norm_out"])
    _conv(sd, "conv_out", params["conv_out"])
    for i, blk in enumerate(params["down_blocks"]):
        for j, rn in enumerate(blk["resnets"]):
            _resnet(sd, f"down_blocks.{i}.resnets.{j}", rn)
        for j, at in enumerate(blk["attentions"]):
            _transformer(sd, f"down_blocks.{i}.attentions.{j}", at)
        if "downsample" in blk:
            _conv(sd, f"down_blocks.{i}.downsamplers.0.conv", blk["downsample"])
    for j, rn in enumerate(params["mid_block"]["resnets"]):
        _resnet(sd, f"mid_block.resnets.{j}", rn)
    _transformer(sd, "mid_block.attentions.0", params["mid_block"]["attentions"][0])
    for i, blk in enumerate(params["up_blocks"]):
        for j, rn in enumerate(blk["resnets"]):
            _resnet(sd, f"up_blocks.{i}.resnets.{j}", rn)
        for j, at in enumerate(blk["attentions"]):
            _transformer(sd, f"up_blocks.{i}.attentions.{j}", at)
        if "upsample" in blk:
            _conv(sd, f"up_blocks.{i}.upsamplers.0.conv", blk["upsample"])
    return sd


def _vae_attn(sd, name, p):
    _norm(sd, f"{name}.group_norm", p["group_norm"])
    _lin(sd, f"{name}.to_q", p["to_q"])
    _lin(sd, f"{name}.to_k", p["to_k"])
    _lin(sd, f"{name}.to_v", p["to_v"])
    _lin(sd, f"{name}.to_out.0", p["to_out"])


def export_vae(params: Dict[str, Any], config: VAEConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_vae: diffusers AutoencoderKL layout (>=0.15 attn
    naming: to_q/k/v + to_out.0)."""
    sd: Dict[str, np.ndarray] = {}
    enc = params["encoder"]
    _conv(sd, "encoder.conv_in", enc["conv_in"])
    for i, blk in enumerate(enc["down_blocks"]):
        for j, rn in enumerate(blk["resnets"]):
            _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}", rn)
        if "downsample" in blk:
            _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv",
                  blk["downsample"])
    _resnet(sd, "encoder.mid_block.resnets.0", enc["mid"]["resnet_1"])
    _vae_attn(sd, "encoder.mid_block.attentions.0", enc["mid"]["attn"])
    _resnet(sd, "encoder.mid_block.resnets.1", enc["mid"]["resnet_2"])
    _norm(sd, "encoder.conv_norm_out", enc["norm_out"])
    _conv(sd, "encoder.conv_out", enc["conv_out"])

    dec = params["decoder"]
    _conv(sd, "decoder.conv_in", dec["conv_in"])
    _resnet(sd, "decoder.mid_block.resnets.0", dec["mid"]["resnet_1"])
    _vae_attn(sd, "decoder.mid_block.attentions.0", dec["mid"]["attn"])
    _resnet(sd, "decoder.mid_block.resnets.1", dec["mid"]["resnet_2"])
    for i, blk in enumerate(dec["up_blocks"]):
        for j, rn in enumerate(blk["resnets"]):
            _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}", rn)
        if "upsample" in blk:
            _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv", blk["upsample"])
    _norm(sd, "decoder.conv_norm_out", dec["norm_out"])
    _conv(sd, "decoder.conv_out", dec["conv_out"])
    _conv(sd, "quant_conv", params["quant_conv"])
    _conv(sd, "post_quant_conv", params["post_quant_conv"])
    return sd


def export_clip_text(params: Dict[str, Any],
                     config: CLIPTextConfig) -> Dict[str, np.ndarray]:
    """Inverse of convert_clip_text (transformers CLIPTextModel layout,
    including the position_ids buffer older transformers versions persist)."""
    sd: Dict[str, np.ndarray] = {
        "text_model.embeddings.token_embedding.weight":
            np.asarray(params["token_embedding"]),
        "text_model.embeddings.position_embedding.weight":
            np.asarray(params["position_embedding"]),
        "text_model.embeddings.position_ids":
            np.arange(config.max_length, dtype=np.int64)[None],
    }
    _norm(sd, "text_model.final_layer_norm", params["final_layer_norm"])
    for i, lp in enumerate(params["layers"]):
        base = f"text_model.encoder.layers.{i}"
        _norm(sd, f"{base}.layer_norm1", lp["layer_norm1"])
        _lin(sd, f"{base}.self_attn.q_proj", lp["q_proj"])
        _lin(sd, f"{base}.self_attn.k_proj", lp["k_proj"])
        _lin(sd, f"{base}.self_attn.v_proj", lp["v_proj"])
        _lin(sd, f"{base}.self_attn.out_proj", lp["out_proj"])
        _norm(sd, f"{base}.layer_norm2", lp["layer_norm2"])
        _lin(sd, f"{base}.mlp.fc1", lp["fc1"])
        _lin(sd, f"{base}.mlp.fc2", lp["fc2"])
    return sd


# Keys real checkpoints contain that the importers intentionally ignore
# (non-parameter buffers).
KNOWN_IGNORED_KEYS = {"text_model.embeddings.position_ids"}
