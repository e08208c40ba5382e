"""CompVis-LDM checkpoint -> param-tree converter.

The instruction-editing checkpoints (InstructPix2Pix `instruct-pix2pix-00-22000.ckpt`,
InstructDiffusion `v1-5-pretrained.ckpt` style; reference
run_editing_instructpix2pix.py:49-70) and EDICT's vendored stack use the
original CompVis state-dict layout (``model.diffusion_model.input_blocks...``,
``first_stage_model...``, ``cond_stage_model.transformer...``). This maps them
onto our trees — the same renaming scheme diffusers' official conversion
scripts implement, reproduced here so checkpoints convert fully offline.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from pnpinversion_tpu.configs import CLIPTextConfig, UNetConfig, VAEConfig


def _lin(sd, name):
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _conv(sd, name):
    w = sd[f"{name}.weight"]
    if w.ndim == 2:  # some proj layers are stored as linear
        w = w[:, :, None, None]
    p = {"kernel": np.ascontiguousarray(w.transpose(2, 3, 1, 0))}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _resnet_ldm(sd, base, with_time=True):
    p = {
        "norm1": _norm(sd, f"{base}.in_layers.0"),
        "conv1": _conv(sd, f"{base}.in_layers.2"),
        "norm2": _norm(sd, f"{base}.out_layers.0"),
        "conv2": _conv(sd, f"{base}.out_layers.3"),
    }
    if with_time and f"{base}.emb_layers.1.weight" in sd:
        p["time_emb_proj"] = _lin(sd, f"{base}.emb_layers.1")
    if f"{base}.skip_connection.weight" in sd:
        p["conv_shortcut"] = _conv(sd, f"{base}.skip_connection")
    return p


def _transformer_ldm(sd, base):
    blocks = []
    i = 0
    while f"{base}.transformer_blocks.{i}.norm1.weight" in sd:
        tb = f"{base}.transformer_blocks.{i}"

        def attn(a):
            return {
                "to_q": _lin(sd, f"{a}.to_q"),
                "to_k": _lin(sd, f"{a}.to_k"),
                "to_v": _lin(sd, f"{a}.to_v"),
                "to_out": _lin(sd, f"{a}.to_out.0"),
            }

        blocks.append({
            "norm1": _norm(sd, f"{tb}.norm1"),
            "attn1": attn(f"{tb}.attn1"),
            "norm2": _norm(sd, f"{tb}.norm2"),
            "attn2": attn(f"{tb}.attn2"),
            "norm3": _norm(sd, f"{tb}.norm3"),
            "ff": {"geglu": _lin(sd, f"{tb}.ff.net.0.proj"),
                   "out": _lin(sd, f"{tb}.ff.net.2")},
        })
        i += 1
    return {
        "norm": _norm(sd, f"{base}.norm"),
        "proj_in": _conv(sd, f"{base}.proj_in"),
        "blocks": blocks,
        "proj_out": _conv(sd, f"{base}.proj_out"),
    }


def convert_ldm_unet(sd: Dict[str, np.ndarray],
                     config: UNetConfig = UNetConfig()) -> Dict[str, Any]:
    """sd keys under ``model.diffusion_model.`` (pass the stripped dict)."""
    n = len(config.block_out_channels)
    L = config.layers_per_block
    params: Dict[str, Any] = {
        "time_embedding": {
            "linear_1": _lin(sd, "time_embed.0"),
            "linear_2": _lin(sd, "time_embed.2"),
        },
        "conv_in": _conv(sd, "input_blocks.0.0"),
        "conv_norm_out": _norm(sd, "out.0"),
        "conv_out": _conv(sd, "out.2"),
    }
    # input_blocks: index 0 = conv_in; then per level: L resnet(+attn) blocks,
    # then a downsample block (except the last level)
    down = []
    idx = 1
    for i in range(n):
        blk: Dict[str, Any] = {"resnets": [], "attentions": []}
        for _ in range(L):
            blk["resnets"].append(_resnet_ldm(sd, f"input_blocks.{idx}.0"))
            if config.cross_attention[i]:
                blk["attentions"].append(_transformer_ldm(sd, f"input_blocks.{idx}.1"))
            idx += 1
        if i < n - 1:
            blk["downsample"] = _conv(sd, f"input_blocks.{idx}.0.op")
            idx += 1
        down.append(blk)
    params["down_blocks"] = down

    params["mid_block"] = {
        "resnets": [_resnet_ldm(sd, "middle_block.0"),
                    _resnet_ldm(sd, "middle_block.2")],
        "attentions": [_transformer_ldm(sd, "middle_block.1")],
    }

    up = []
    idx = 0
    for i in range(n):
        down_idx = n - 1 - i
        blk = {"resnets": [], "attentions": []}
        for j in range(L + 1):
            blk["resnets"].append(_resnet_ldm(sd, f"output_blocks.{idx}.0"))
            if config.cross_attention[down_idx]:
                blk["attentions"].append(_transformer_ldm(sd, f"output_blocks.{idx}.1"))
            if j == L and i < n - 1:
                # upsampler lives in the last sub-block of the level; its
                # module index depends on whether attention is present
                k = 2 if config.cross_attention[down_idx] else 1
                blk["upsample"] = _conv(sd, f"output_blocks.{idx}.{k}.conv")
            idx += 1
        up.append(blk)
    params["up_blocks"] = up
    return params


def strip_prefix(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, np.ndarray]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def convert_ldm_checkpoint(sd: Dict[str, np.ndarray], unet_config: UNetConfig,
                           vae_config: VAEConfig = VAEConfig(),
                           text_config: CLIPTextConfig = CLIPTextConfig()) -> Dict[str, Any]:
    """Full CompVis checkpoint -> {'unet','vae','text'} trees.

    The first-stage VAE and CLIP text encoder inside CompVis checkpoints use
    yet another naming scheme; VAE keys are remapped to the diffusers layout
    first, then reuse convert/torch_to_jax.convert_vae.
    """
    from pnpinversion_tpu.convert.torch_to_jax import convert_clip_text, convert_vae

    unet = convert_ldm_unet(strip_prefix(sd, "model.diffusion_model."), unet_config)

    vae_sd = strip_prefix(sd, "first_stage_model.")
    vae_sd = _remap_ldm_vae(vae_sd, vae_config)
    vae = convert_vae(vae_sd, vae_config)

    text_sd = strip_prefix(sd, "cond_stage_model.transformer.")
    text = convert_clip_text(text_sd, text_config)
    return {"unet": unet, "vae": vae, "text": text}


def ldm_vae_rename_map(config: VAEConfig):
    """(CompVis prefix -> diffusers prefix, CompVis resnet part -> diffusers
    part) rename tables; public so tests can synthesize LDM-layout VAEs."""
    n = len(config.block_out_channels)
    ren = {}
    for side in ("encoder", "decoder"):
        ren[f"{side}.conv_in"] = f"{side}.conv_in"
        ren[f"{side}.norm_out"] = f"{side}.conv_norm_out"
        ren[f"{side}.conv_out"] = f"{side}.conv_out"
        ren[f"{side}.mid.block_1"] = f"{side}.mid_block.resnets.0"
        ren[f"{side}.mid.block_2"] = f"{side}.mid_block.resnets.1"
    for i in range(n):
        for j in range(config.layers_per_block):
            ren[f"encoder.down.{i}.block.{j}"] = f"encoder.down_blocks.{i}.resnets.{j}"
        ren[f"encoder.down.{i}.downsample.conv"] = (
            f"encoder.down_blocks.{i}.downsamplers.0.conv")
        for j in range(config.layers_per_block + 1):
            # decoder "up" levels are reversed in CompVis
            ren[f"decoder.up.{n - 1 - i}.block.{j}"] = f"decoder.up_blocks.{i}.resnets.{j}"
        ren[f"decoder.up.{n - 1 - i}.upsample.conv"] = (
            f"decoder.up_blocks.{i}.upsamplers.0.conv")
    attn_parts = {"norm": "group_norm", "q": "to_q", "k": "to_k", "v": "to_v",
                  "proj_out": "to_out.0"}
    for side in ("encoder", "decoder"):
        for old, new in attn_parts.items():
            ren[f"{side}.mid.attn_1.{old}"] = f"{side}.mid_block.attentions.0.{new}"
    resnet_parts = {"norm1": "norm1", "conv1": "conv1", "norm2": "norm2",
                    "conv2": "conv2", "nin_shortcut": "conv_shortcut"}
    return ren, resnet_parts


def _remap_ldm_vae(sd: Dict[str, np.ndarray], config: VAEConfig) -> Dict[str, np.ndarray]:
    """CompVis VAE names -> diffusers VAE names (subset needed by convert_vae)."""
    ren, resnet_parts = ldm_vae_rename_map(config)
    out: Dict[str, np.ndarray] = {}
    for key in sd:
        mapped = key  # quant_conv / post_quant_conv already match
        # longest-prefix match so "encoder.down.1.block.0" beats "encoder.down.1"
        for old in sorted(ren, key=len, reverse=True):
            if key.startswith(old + "."):
                rest = key[len(old) + 1:]
                head = rest.split(".")[0]
                if head in resnet_parts:
                    rest = resnet_parts[head] + rest[len(head):]
                mapped = f"{ren[old]}.{rest}"
                break
        v = sd[key]
        # VAE attention q/k/v are 1x1 convs in CompVis; our tree wants linear
        if "attentions.0.to_" in mapped and v.ndim == 4:
            v = v[:, :, 0, 0]
        out[mapped] = v
    return out
