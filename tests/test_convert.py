"""Weight-converter checks.

- CLIP text: REAL oracle — instantiate a tiny transformers CLIPTextModel,
  convert its state dict, and match hidden states numerically (validates both
  the name mapping and clip_text_apply's math).
- UNet: round-trip through a synthetic diffusers-layout state dict.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import CLIPTextConfig, TINY_UNET
from pnpinversion_tpu.convert.torch_to_jax import convert_clip_text, convert_unet
from pnpinversion_tpu.models.clip_text import clip_text_apply
from pnpinversion_tpu.models.unet import init_unet_params, unet_apply


def test_clip_text_matches_transformers():
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel

    hf_cfg = HFConfig(vocab_size=99, hidden_size=32, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=2,
                      max_position_embeddings=77, hidden_act="quick_gelu")
    torch.manual_seed(0)
    model = CLIPTextModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    cfg = CLIPTextConfig(vocab_size=99, width=32, layers=2, heads=2,
                         max_length=77, activation="quick_gelu")
    params = convert_clip_text(sd, cfg)

    ids = np.random.RandomState(0).randint(0, 99, size=(2, 77)).astype(np.int64)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids)).last_hidden_state.numpy()
    ours = np.asarray(clip_text_apply(params, jnp.asarray(ids, jnp.int32), cfg))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


def _export_unet(params, config):
    """Inverse of convert_unet: our tree -> diffusers-layout state dict."""
    sd = {}

    def lin(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).T
        if "bias" in p:
            sd[f"{name}.bias"] = np.asarray(p["bias"])

    def conv(name, p):
        sd[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in p:
            sd[f"{name}.bias"] = np.asarray(p["bias"])

    def norm(name, p):
        sd[f"{name}.weight"] = np.asarray(p["scale"])
        sd[f"{name}.bias"] = np.asarray(p["bias"])

    def resnet(name, p):
        norm(f"{name}.norm1", p["norm1"])
        conv(f"{name}.conv1", p["conv1"])
        norm(f"{name}.norm2", p["norm2"])
        conv(f"{name}.conv2", p["conv2"])
        if "time_emb_proj" in p:
            lin(f"{name}.time_emb_proj", p["time_emb_proj"])
        if "conv_shortcut" in p:
            conv(f"{name}.conv_shortcut", p["conv_shortcut"])

    def attn(name, p):
        lin(f"{name}.to_q", p["to_q"])
        lin(f"{name}.to_k", p["to_k"])
        lin(f"{name}.to_v", p["to_v"])
        lin(f"{name}.to_out.0", p["to_out"])

    def transformer(name, p):
        norm(f"{name}.norm", p["norm"])
        conv(f"{name}.proj_in", p["proj_in"])
        conv(f"{name}.proj_out", p["proj_out"])
        for i, blk in enumerate(p["blocks"]):
            tb = f"{name}.transformer_blocks.{i}"
            norm(f"{tb}.norm1", blk["norm1"])
            attn(f"{tb}.attn1", blk["attn1"])
            norm(f"{tb}.norm2", blk["norm2"])
            attn(f"{tb}.attn2", blk["attn2"])
            norm(f"{tb}.norm3", blk["norm3"])
            lin(f"{tb}.ff.net.0.proj", blk["ff"]["geglu"])
            lin(f"{tb}.ff.net.2", blk["ff"]["out"])

    lin("time_embedding.linear_1", params["time_embedding"]["linear_1"])
    lin("time_embedding.linear_2", params["time_embedding"]["linear_2"])
    conv("conv_in", params["conv_in"])
    norm("conv_norm_out", params["conv_norm_out"])
    conv("conv_out", params["conv_out"])
    for i, blk in enumerate(params["down_blocks"]):
        for j, rn in enumerate(blk["resnets"]):
            resnet(f"down_blocks.{i}.resnets.{j}", rn)
        for j, at in enumerate(blk["attentions"]):
            transformer(f"down_blocks.{i}.attentions.{j}", at)
        if "downsample" in blk:
            conv(f"down_blocks.{i}.downsamplers.0.conv", blk["downsample"])
    for j, rn in enumerate(params["mid_block"]["resnets"]):
        resnet(f"mid_block.resnets.{j}", rn)
    transformer("mid_block.attentions.0", params["mid_block"]["attentions"][0])
    for i, blk in enumerate(params["up_blocks"]):
        for j, rn in enumerate(blk["resnets"]):
            resnet(f"up_blocks.{i}.resnets.{j}", rn)
        for j, at in enumerate(blk["attentions"]):
            transformer(f"up_blocks.{i}.attentions.{j}", at)
        if "upsample" in blk:
            conv(f"up_blocks.{i}.upsamplers.0.conv", blk["upsample"])
    return sd


def test_unet_converter_roundtrip():
    params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    sd = _export_unet(params, TINY_UNET)
    back = convert_unet(sd, TINY_UNET)
    # identical trees -> identical forward
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
    a, _ = unet_apply(params, x, jnp.int32(500), ctx, TINY_UNET)
    b, _ = unet_apply(back, x, jnp.int32(500), ctx, TINY_UNET)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_ldm_unet_converter_parses():
    """LDM-layout export of the same tree -> convert_ldm_unet round-trip."""
    from pnpinversion_tpu.convert.ldm_to_jax import convert_ldm_unet

    params = init_unet_params(jax.random.PRNGKey(0), TINY_UNET)
    dsd = _export_unet(params, TINY_UNET)

    # rename diffusers layout -> CompVis layout for the tiny (2-level) config
    n, L = 2, 1
    ren = {
        "time_embedding.linear_1": "time_embed.0",
        "time_embedding.linear_2": "time_embed.2",
        "conv_in": "input_blocks.0.0",
        "conv_norm_out": "out.0",
        "conv_out": "out.2",
        "mid_block.resnets.0": "middle_block.0",
        "mid_block.attentions.0": "middle_block.1",
        "mid_block.resnets.1": "middle_block.2",
        "down_blocks.0.resnets.0": "input_blocks.1.0",
        "down_blocks.0.attentions.0": "input_blocks.1.1",
        "down_blocks.0.downsamplers.0.conv": "input_blocks.2.0.op",
        "down_blocks.1.resnets.0": "input_blocks.3.0",
        "down_blocks.1.attentions.0": "input_blocks.3.1",
        "up_blocks.0.resnets.0": "output_blocks.0.0",
        "up_blocks.0.attentions.0": "output_blocks.0.1",
        "up_blocks.0.resnets.1": "output_blocks.1.0",
        "up_blocks.0.attentions.1": "output_blocks.1.1",
        "up_blocks.0.upsamplers.0.conv": "output_blocks.1.2.conv",
        "up_blocks.1.resnets.0": "output_blocks.2.0",
        "up_blocks.1.attentions.0": "output_blocks.2.1",
        "up_blocks.1.resnets.1": "output_blocks.3.0",
        "up_blocks.1.attentions.1": "output_blocks.3.1",
    }
    resnet_ren = {"norm1": "in_layers.0", "conv1": "in_layers.2",
                  "norm2": "out_layers.0", "conv2": "out_layers.3",
                  "time_emb_proj": "emb_layers.1", "conv_shortcut": "skip_connection"}
    lsd = {}
    for key, v in dsd.items():
        for old in sorted(ren, key=len, reverse=True):
            if key.startswith(old):
                rest = key[len(old):].lstrip(".")
                head = rest.split(".")[0] if rest else ""
                new = ren[old]
                if ("resnets" in old) and head in resnet_ren:
                    rest = resnet_ren[head] + rest[len(head):]
                lsd[(new + "." + rest) if rest else new] = v
                break
        else:
            raise AssertionError(f"unmapped {key}")
    back = convert_ldm_unet(lsd, TINY_UNET)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.PRNGKey(2), (1, 77, 32))
    a, _ = unet_apply(params, x, jnp.int32(500), ctx, TINY_UNET)
    b, _ = unet_apply(back, x, jnp.int32(500), ctx, TINY_UNET)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)