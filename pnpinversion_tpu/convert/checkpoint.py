"""Converted-checkpoint IO.

``convert_sd_checkpoint`` turns a local HF StableDiffusion directory
(unet/ vae/ text_encoder/ tokenizer/) into our param trees and caches them
with orbax so subsequent loads are instant (SURVEY.md §5 checkpoint plan).
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from pnpinversion_tpu.configs import StableDiffusionConfig
from pnpinversion_tpu.convert.torch_to_jax import (
    convert_clip_text,
    convert_unet,
    convert_vae,
    load_state_dict,
)

CACHE_SUBDIR = "pnpi_tpu_params"


def _orbax_save(path: str, params) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def _orbax_load(path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))


def convert_sd_checkpoint(hf_dir: str, config: StableDiffusionConfig,
                          cache: bool = True) -> Dict[str, Any]:
    """hf_dir: local HF pipeline directory with unet/, vae/, text_encoder/."""
    cache_dir = os.path.join(hf_dir, CACHE_SUBDIR, config.name)
    if cache and os.path.isdir(cache_dir):
        return _orbax_load(cache_dir)
    params = {
        "unet": convert_unet(load_state_dict(os.path.join(hf_dir, "unet")), config.unet),
        "vae": convert_vae(load_state_dict(os.path.join(hf_dir, "vae")), config.vae),
        "text": convert_clip_text(
            load_state_dict(os.path.join(hf_dir, "text_encoder")), config.text),
    }
    params = jax.tree.map(lambda x: np.asarray(x, np.float32), params)
    if cache:
        _orbax_save(cache_dir, params)
    return params


def load_pipeline_params(checkpoint_dir: str, config: StableDiffusionConfig,
                         tokenizer=None) -> Tuple[Dict[str, Any], Any]:
    params = convert_sd_checkpoint(checkpoint_dir, config)
    if tokenizer is None:
        from pnpinversion_tpu.utils.tokenizer import default_tokenizer

        tok_dir = os.path.join(checkpoint_dir, "tokenizer")
        tokenizer = default_tokenizer(tok_dir if os.path.isdir(tok_dir) else None)
    return params, tokenizer


def load_metric_params(checkpoint_dir: str) -> Dict[str, Any]:
    """Optional converted metric-model weights (clip_vision / lpips / dino).
    Each lives in its own orbax subdirectory; missing ones are skipped."""
    out: Dict[str, Any] = {}
    for name in ("clip_vision", "clip_text", "clip_text_proj", "lpips", "dino"):
        p = os.path.join(checkpoint_dir, CACHE_SUBDIR, name)
        if os.path.isdir(p):
            out[name] = _orbax_load(p)
    return out
