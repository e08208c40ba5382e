"""Converters for the evaluator's metric models and BLIP.

Sources (all loaded from local files — zero egress):
- CLIP ViT-L/14 (HF CLIPModel / CLIPVisionModelWithProjection +
  CLIPTextModelWithProjection) -> vit.init_vit_params layout + text tower.
- DINO ViT-B/8 (torch.hub facebookresearch/dino state dict) -> vit 'dino'.
- LPIPS SqueezeNet (torchvision squeezenet1_1 features + the lpips package's
  linear heads) -> models/lpips layout.
- BLIP-base captioner (HF blip-image-captioning-base) -> models/blip layout.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from pnpinversion_tpu.convert.torch_to_jax import load_state_dict


def _lin(sd, name):
    p = {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].T)}
    if f"{name}.bias" in sd:
        p["bias"] = sd[f"{name}.bias"]
    return p


def _norm(sd, name):
    return {"scale": sd[f"{name}.weight"], "bias": sd[f"{name}.bias"]}


def _fused_qkv(sd, base):
    """separate q/k/v projections -> our fused qkv linear (w, 3w)."""
    ks = [np.ascontiguousarray(sd[f"{base}.{n}_proj.weight"].T) for n in "qkv"]
    bs = [sd[f"{base}.{n}_proj.bias"] for n in "qkv"]
    return {"kernel": np.concatenate(ks, axis=1), "bias": np.concatenate(bs)}


def convert_clip_vision(sd: Dict[str, np.ndarray], layers: int) -> Dict[str, Any]:
    """HF CLIPVisionModel(-WithProjection) -> vit 'clip' layout."""
    pre = "vision_model." if any(k.startswith("vision_model.") for k in sd) else ""
    p: Dict[str, Any] = {
        "patch_embed": np.ascontiguousarray(
            sd[f"{pre}embeddings.patch_embedding.weight"].transpose(2, 3, 1, 0)),
        "cls_token": sd[f"{pre}embeddings.class_embedding"].reshape(1, 1, -1),
        "pos_embed": sd[f"{pre}embeddings.position_embedding.weight"][None],
        # HF's (sic) "pre_layrnorm"
        "pre_layernorm": _norm(sd, f"{pre}pre_layrnorm"),
        "post_layernorm": _norm(sd, f"{pre}post_layernorm"),
        "layers": [],
    }
    if "visual_projection.weight" in sd:
        p["projection"] = {"kernel": np.ascontiguousarray(
            sd["visual_projection.weight"].T)}
    for i in range(layers):
        base = f"{pre}encoder.layers.{i}"
        p["layers"].append({
            "ln1": _norm(sd, f"{base}.layer_norm1"),
            "qkv": _fused_qkv(sd, f"{base}.self_attn"),
            "out_proj": _lin(sd, f"{base}.self_attn.out_proj"),
            "ln2": _norm(sd, f"{base}.layer_norm2"),
            "fc1": _lin(sd, f"{base}.mlp.fc1"),
            "fc2": _lin(sd, f"{base}.mlp.fc2"),
        })
    return p


def convert_dino_vit(sd: Dict[str, np.ndarray], layers: int = 12) -> Dict[str, Any]:
    """facebookresearch/dino ViT state dict -> vit 'dino' layout."""
    p: Dict[str, Any] = {
        "patch_embed": np.ascontiguousarray(
            sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0)),
        "patch_bias": sd["patch_embed.proj.bias"],
        "cls_token": sd["cls_token"],
        "pos_embed": sd["pos_embed"],
        "norm": _norm(sd, "norm"),
        "layers": [],
    }
    for i in range(layers):
        base = f"blocks.{i}"
        p["layers"].append({
            "ln1": _norm(sd, f"{base}.norm1"),
            "qkv": _lin(sd, f"{base}.attn.qkv"),
            "out_proj": _lin(sd, f"{base}.attn.proj"),
            "ln2": _norm(sd, f"{base}.norm2"),
            "fc1": _lin(sd, f"{base}.mlp.fc1"),
            "fc2": _lin(sd, f"{base}.mlp.fc2"),
        })
    return p


def _convconv(sd, name):
    return {"kernel": np.ascontiguousarray(sd[f"{name}.weight"].transpose(2, 3, 1, 0)),
            "bias": sd[f"{name}.bias"]}


def convert_lpips_squeeze(backbone_sd: Dict[str, np.ndarray],
                          lpips_sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision squeezenet1_1 ``features.*`` + lpips ``lin*.model.1.weight``.

    Either dict may carry prefixes ('net.slice1.', 'features.'); keys are
    normalized to the torchvision layout first.
    """
    sd = {}
    for k, v in backbone_sd.items():
        k = k.replace("net.", "")
        sd[k] = v
    fire_ids = [3, 4, 6, 7, 9, 10, 11, 12]
    p: Dict[str, Any] = {
        "conv0": _convconv(sd, "features.0"),
        "fires": [],
        "lins": [],
    }
    for fid in fire_ids:
        p["fires"].append({
            "squeeze": _convconv(sd, f"features.{fid}.squeeze"),
            "expand1": _convconv(sd, f"features.{fid}.expand1x1"),
            "expand3": _convconv(sd, f"features.{fid}.expand3x3"),
        })
    for i in range(7):
        key = f"lin{i}.model.1.weight"
        if key not in lpips_sd:
            key = f"lins.{i}.model.1.weight"
        p["lins"].append({"kernel": np.ascontiguousarray(
            lpips_sd[key].transpose(2, 3, 1, 0))})
    return p


def convert_blip_decoder(sd: Dict[str, np.ndarray], layers: int = 12) -> Dict[str, Any]:
    """HF BlipTextLMHeadModel (text_decoder.*) -> models/blip layout."""
    pre = ""
    for cand in ("text_decoder.bert.", "bert.", ""):
        if any(k.startswith(cand + "embeddings.") for k in sd):
            pre = cand
            break
    cls_pre = pre.replace("bert.", "")
    p: Dict[str, Any] = {
        "word_embedding": sd[f"{pre}embeddings.word_embeddings.weight"],
        "position_embedding": sd[f"{pre}embeddings.position_embeddings.weight"],
        "embed_norm": _norm(sd, f"{pre}embeddings.LayerNorm"),
        "layers": [],
        "cls_dense": _lin(sd, f"{cls_pre}cls.predictions.transform.dense"),
        "cls_norm": _norm(sd, f"{cls_pre}cls.predictions.transform.LayerNorm"),
        "cls_decoder": _lin(sd, f"{cls_pre}cls.predictions.decoder"),
    }
    # HF/lavis tie cls.predictions.bias to decoder.bias and persist BOTH;
    # the standalone bias is the canonical Parameter, so prefer it
    tied_bias = f"{cls_pre}cls.predictions.bias"
    if tied_bias in sd:
        p["cls_decoder"]["bias"] = np.asarray(sd[tied_bias])
    for i in range(layers):
        b = f"{pre}encoder.layer.{i}"
        p["layers"].append({
            "self_q": _lin(sd, f"{b}.attention.self.query"),
            "self_k": _lin(sd, f"{b}.attention.self.key"),
            "self_v": _lin(sd, f"{b}.attention.self.value"),
            "self_out": _lin(sd, f"{b}.attention.output.dense"),
            "self_norm": _norm(sd, f"{b}.attention.output.LayerNorm"),
            "cross_q": _lin(sd, f"{b}.crossattention.self.query"),
            "cross_k": _lin(sd, f"{b}.crossattention.self.key"),
            "cross_v": _lin(sd, f"{b}.crossattention.self.value"),
            "cross_out": _lin(sd, f"{b}.crossattention.output.dense"),
            "cross_norm": _norm(sd, f"{b}.crossattention.output.LayerNorm"),
            "fc1": _lin(sd, f"{b}.intermediate.dense"),
            "fc2": _lin(sd, f"{b}.output.dense"),
            "out_norm": _norm(sd, f"{b}.output.LayerNorm"),
        })
    return p


def convert_metric_checkpoints(checkpoint_dir: str) -> Dict[str, Any]:
    """Convert whatever metric-model weight directories exist under
    checkpoint_dir/{clip,dino,lpips,blip} and cache them with orbax."""
    import os

    from pnpinversion_tpu.convert.checkpoint import CACHE_SUBDIR, _orbax_save
    from pnpinversion_tpu.convert.torch_to_jax import convert_clip_text

    out: Dict[str, Any] = {}
    clip_dir = os.path.join(checkpoint_dir, "clip")
    if os.path.isdir(clip_dir):
        sd = load_state_dict(clip_dir)
        vis = {k[len("vision_model."):] if k.startswith("vision_model.") else k: v
               for k, v in sd.items()}
        out["clip_vision"] = convert_clip_vision(sd, layers=24)
        out["clip_text"] = convert_clip_text(
            {k[len("text_model."):]: v for k, v in sd.items()
             if k.startswith("text_model.")})
        if "text_projection.weight" in sd:
            out["clip_text_proj"] = {"kernel": np.ascontiguousarray(
                sd["text_projection.weight"].T)}
    dino_dir = os.path.join(checkpoint_dir, "dino")
    if os.path.isdir(dino_dir):
        out["dino"] = convert_dino_vit(load_state_dict(dino_dir))
    lpips_dir = os.path.join(checkpoint_dir, "lpips")
    if os.path.isdir(lpips_dir):
        sd = load_state_dict(lpips_dir)
        out["lpips"] = convert_lpips_squeeze(sd, sd)
    for name, params in out.items():
        _orbax_save(os.path.join(checkpoint_dir, CACHE_SUBDIR, name), params)
    return out
