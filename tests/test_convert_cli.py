"""Turnkey weight-day CLI (python -m pnpinversion_tpu.convert) against
synthetic tiny checkpoints: every source converts through the REAL CLI code
path, key consumption + tree structure are asserted, caches land where the
runtime loaders look, and the manifest records it all (VERDICT r2 #4)."""
import json
import os

import jax
import numpy as np
import pytest

import pnpinversion_tpu.convert.__main__ as cli
from pnpinversion_tpu.configs import TINY
from pnpinversion_tpu.convert.export import (
    export_clip_text,
    export_unet,
    export_vae,
)
from pnpinversion_tpu.convert.ldm_to_jax import ldm_vae_rename_map
from pnpinversion_tpu.models.clip_text import init_clip_text_params
from pnpinversion_tpu.models.unet import init_unet_params
from pnpinversion_tpu.models.vae import init_vae_params


def _save_safetensors(d, sd):
    from safetensors.numpy import save_file

    os.makedirs(d, exist_ok=True)
    save_file({k: np.ascontiguousarray(np.asarray(v, np.float32))
               for k, v in sd.items()}, os.path.join(d, "model.safetensors"))


def _tiny_sd_trees():
    return (init_unet_params(jax.random.PRNGKey(1), TINY.unet),
            init_vae_params(jax.random.PRNGKey(2), TINY.vae),
            init_clip_text_params(jax.random.PRNGKey(3), TINY.text))


def _make_hf_dir(root):
    unet_p, vae_p, text_p = _tiny_sd_trees()
    _save_safetensors(os.path.join(root, "unet"), export_unet(unet_p, TINY.unet))
    _save_safetensors(os.path.join(root, "vae"), export_vae(vae_p, TINY.vae))
    _save_safetensors(os.path.join(root, "text_encoder"),
                      export_clip_text(text_p, TINY.text))


# diffusers prefix -> CompVis prefix for the TINY (2-level) UNet topology
_LDM_UNET_REN = {
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
_LDM_RESNET_REN = {"norm1": "in_layers.0", "conv1": "in_layers.2",
                   "norm2": "out_layers.0", "conv2": "out_layers.3",
                   "time_emb_proj": "emb_layers.1",
                   "conv_shortcut": "skip_connection"}


def _diffusers_unet_to_ldm(dsd):
    lsd = {}
    for key, v in dsd.items():
        for old in sorted(_LDM_UNET_REN, key=len, reverse=True):
            if key.startswith(old):
                rest = key[len(old):].lstrip(".")
                head = rest.split(".")[0] if rest else ""
                if "resnets" in old and head in _LDM_RESNET_REN:
                    rest = _LDM_RESNET_REN[head] + rest[len(head):]
                new = _LDM_UNET_REN[old]
                lsd[(new + "." + rest) if rest else new] = v
                break
        else:
            raise AssertionError(f"unmapped {key}")
    return lsd


def _diffusers_vae_to_ldm(dsd):
    ren, resnet_parts = ldm_vae_rename_map(TINY.vae)
    inv_prefix = {v: k for k, v in ren.items()}
    inv_resnet = {v: k for k, v in resnet_parts.items()}
    out = {}
    for key, v in dsd.items():
        mapped = key
        for new in sorted(inv_prefix, key=len, reverse=True):
            if key.startswith(new + "."):
                rest = key[len(new) + 1:]
                head = rest.split(".")[0]
                if head in inv_resnet:
                    rest = inv_resnet[head] + rest[len(head):]
                mapped = f"{inv_prefix[new]}.{rest}"
                break
        # CompVis stores mid-attention q/k/v/proj_out as 1x1 convs
        if ".mid.attn_1." in mapped and v.ndim == 2:
            v = v[:, :, None, None]
        out[mapped] = v
    return out


def _make_ldm_ckpt(path):
    import torch

    unet_p, vae_p, text_p = _tiny_sd_trees()
    sd = {}
    for k, v in _diffusers_unet_to_ldm(export_unet(unet_p, TINY.unet)).items():
        sd[f"model.diffusion_model.{k}"] = v
    for k, v in _diffusers_vae_to_ldm(export_vae(vae_p, TINY.vae)).items():
        sd[f"first_stage_model.{k}"] = v
    for k, v in export_clip_text(text_p, TINY.text).items():
        sd[f"cond_stage_model.transformer.{k}"] = v
    # training-time state a real LDM ckpt carries; must be ignored, not fatal
    sd["betas"] = np.zeros((8,), np.float32)
    sd["alphas_cumprod"] = np.ones((8,), np.float32)
    sd["model_ema.decay"] = np.asarray(0.999, np.float32)
    torch_sd = {k: torch.from_numpy(np.ascontiguousarray(
        np.asarray(v, np.float32))) for k, v in sd.items()}
    torch.save({"state_dict": torch_sd}, path)


def test_convert_cli_sd_and_ldm(tmp_path, monkeypatch):
    root = str(tmp_path)
    _make_hf_dir(root)
    _make_ldm_ckpt(os.path.join(root, "ip2p.ckpt"))

    # tiny configs through the same code path (full-size would need GBs)
    monkeypatch.setattr(cli, "SD14", TINY)
    monkeypatch.setattr(cli, "IP2P", TINY)

    manifest = cli.main(["--root", root])
    m = manifest["models"]

    assert "skipped" not in m["sd14"], m["sd14"]
    for tower in ("unet", "vae", "text"):
        rep = m["sd14"][tower]
        assert rep["keys_consumed"] == rep["keys_total"]
        assert rep["leaves_filled"] > 0
        assert np.isfinite(rep["forward"]["mean"])
    assert os.path.isdir(m["sd14"]["cached_to"])

    assert "skipped" not in m["ip2p"], m["ip2p"]
    for tower in ("unet", "vae", "text"):
        rep = m["ip2p"][tower]
        assert rep["keys_consumed"] == rep["keys_total"]
    assert os.path.isdir(m["ip2p"]["cached_to"])

    assert m["sd21"]["skipped"]
    assert m["instructdiffusion"]["skipped"]

    # the manifest file exists and round-trips
    with open(os.path.join(root, "conversion_manifest.json")) as f:
        assert json.load(f)["models"]["sd14"]["config"] == "tiny"

    # weight-day end state: the runtime loader finds the converted cache and
    # the values round-trip bit-exactly
    from pnpinversion_tpu.convert.checkpoint import load_pipeline_params

    params, _ = load_pipeline_params(root, TINY)
    unet_p, _, _ = _tiny_sd_trees()
    for g, r in zip(jax.tree.leaves(params["unet"]), jax.tree.leaves(unet_p)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))

    # LDM cache: SDPipeline's cache-hit path sees dirname(ckpt)/pnpi_tpu_params
    params2, _ = load_pipeline_params(root, TINY)
    assert set(params2.keys()) == {"unet", "vae", "text"}


def test_convert_cli_ldm_rejects_stray_keys(tmp_path, monkeypatch):
    import torch

    path = os.path.join(str(tmp_path), "ip2p.ckpt")
    _make_ldm_ckpt(path)
    sd = torch.load(path, weights_only=True)["state_dict"]
    sd["surprise.weight"] = torch.zeros(3)
    torch.save({"state_dict": sd}, path)
    monkeypatch.setattr(cli, "IP2P", TINY)
    with pytest.raises(ValueError, match="unrecognized LDM keys"):
        cli.convert_ldm_ckpt(path, TINY)


def test_convert_cli_metrics(tmp_path):
    """clip/dino/lpips/blip through convert_metric_dir with tiny configs;
    caches land under pnpi_tpu_params/ where load_metric_params looks."""
    import torch
    from transformers import BlipTextConfig as HFBlipTextConfig
    from transformers import CLIPConfig, CLIPModel
    from transformers.models.blip.modeling_blip_text import BlipTextLMHeadModel

    from pnpinversion_tpu.configs import CLIPTextConfig
    from pnpinversion_tpu.models import vit
    from pnpinversion_tpu.models.blip import BlipTextConfig
    from pnpinversion_tpu.models.lpips import init_lpips_params

    root = str(tmp_path)

    # CLIP: a real (tiny) transformers CLIPModel state dict
    hf_cfg = CLIPConfig(
        text_config=dict(vocab_size=99, hidden_size=32, intermediate_size=128,
                         num_hidden_layers=2, num_attention_heads=2,
                         max_position_embeddings=77, hidden_act="quick_gelu"),
        vision_config=dict(hidden_size=32, intermediate_size=128,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=32, patch_size=8,
                           hidden_act="quick_gelu"),
        projection_dim=16)
    torch.manual_seed(0)
    clip_model = CLIPModel(hf_cfg).eval()
    _save_safetensors(os.path.join(root, "clip"),
                      {k: v.numpy() for k, v in clip_model.state_dict().items()
                       if "position_ids" not in k})

    # DINO: synthetic timm-style dict (no offline oracle available)
    w, layers = 24, 2
    rng = np.random.RandomState(0)

    def timm_vit_sd():
        sd = {
            "cls_token": rng.randn(1, 1, w), "pos_embed": rng.randn(1, 17, w),
            "patch_embed.proj.weight": rng.randn(w, 3, 8, 8),
            "patch_embed.proj.bias": rng.randn(w),
            "norm.weight": np.ones(w), "norm.bias": np.zeros(w),
        }
        for i in range(layers):
            b = f"blocks.{i}"
            sd.update({
                f"{b}.norm1.weight": np.ones(w), f"{b}.norm1.bias": np.zeros(w),
                f"{b}.attn.qkv.weight": rng.randn(3 * w, w),
                f"{b}.attn.qkv.bias": rng.randn(3 * w),
                f"{b}.attn.proj.weight": rng.randn(w, w),
                f"{b}.attn.proj.bias": rng.randn(w),
                f"{b}.norm2.weight": np.ones(w), f"{b}.norm2.bias": np.zeros(w),
                f"{b}.mlp.fc1.weight": rng.randn(4 * w, w),
                f"{b}.mlp.fc1.bias": rng.randn(4 * w),
                f"{b}.mlp.fc2.weight": rng.randn(w, 4 * w),
                f"{b}.mlp.fc2.bias": rng.randn(w),
            })
        return sd

    _save_safetensors(os.path.join(root, "dino"), timm_vit_sd())

    # LPIPS: synthesize the torch-layout squeezenet + lin heads from our init
    lp = init_lpips_params(jax.random.PRNGKey(5))
    lpips_sd = {}

    def put_conv(name, p):
        lpips_sd[f"{name}.weight"] = np.asarray(p["kernel"]).transpose(3, 2, 0, 1)
        lpips_sd[f"{name}.bias"] = np.asarray(p["bias"])

    put_conv("features.0", lp["conv0"])
    for fid, fire in zip([3, 4, 6, 7, 9, 10, 11, 12], lp["fires"]):
        put_conv(f"features.{fid}.squeeze", fire["squeeze"])
        put_conv(f"features.{fid}.expand1x1", fire["expand1"])
        put_conv(f"features.{fid}.expand3x3", fire["expand3"])
    for i, lin in enumerate(lp["lins"]):
        lpips_sd[f"lin{i}.model.1.weight"] = np.asarray(
            lin["kernel"]).transpose(3, 2, 0, 1)
    _save_safetensors(os.path.join(root, "lpips"), lpips_sd)

    # BLIP: lavis layout = visual_encoder.* (timm ViT) + text_decoder.* (bert)
    blip_hf = HFBlipTextConfig(vocab_size=64, hidden_size=32,
                               intermediate_size=128, num_hidden_layers=2,
                               num_attention_heads=2, encoder_hidden_size=32,
                               is_decoder=True)
    torch.manual_seed(1)
    dec = BlipTextLMHeadModel(blip_hf).eval()
    blip_sd = {f"text_decoder.{k}": v.numpy()
               for k, v in dec.state_dict().items()
               if "position_ids" not in k}
    for k, v in timm_vit_sd().items():
        blip_sd[f"visual_encoder.{k}"] = v
    _save_safetensors(os.path.join(root, "blip"), blip_sd)

    tiny_clip = vit.ViTConfig(image_size=32, patch_size=8, width=32, layers=2,
                              heads=2, projection_dim=16)
    tiny_dino = vit.ViTConfig(image_size=32, patch_size=8, width=w,
                              layers=layers, heads=2, style="dino",
                              activation="gelu")
    report = cli.convert_metric_dir(
        root, clip_cfg=tiny_clip, dino_cfg=tiny_dino,
        blip_text_cfg=BlipTextConfig(vocab_size=64, width=32, layers=2,
                                     heads=2),
        clip_text_cfg=CLIPTextConfig(vocab_size=99, width=32, layers=2,
                                     heads=2, max_length=77,
                                     activation="quick_gelu"))
    assert report["dino"]["keys_consumed"] == report["dino"]["keys_total"]
    assert report["lpips"]["leaves_filled"] == len(jax.tree.leaves(lp))
    assert report["blip"]["decoder_keys"]["keys_consumed"] > 0
    assert report["blip"]["vision_keys"]["keys_consumed"] > 0

    from pnpinversion_tpu.convert.checkpoint import load_metric_params

    loaded = load_metric_params(root)
    assert {"clip_vision", "clip_text", "clip_text_proj", "dino",
            "lpips"} <= set(loaded.keys())
    # BLIP caches where make_blip_captioner looks
    from pnpinversion_tpu.convert.checkpoint import CACHE_SUBDIR

    assert os.path.isdir(os.path.join(root, CACHE_SUBDIR, "blip_vision"))
    assert os.path.isdir(os.path.join(root, CACHE_SUBDIR, "blip_decoder"))
