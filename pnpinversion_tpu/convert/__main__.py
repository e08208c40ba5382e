"""Turnkey weight-day CLI (one command from raw checkpoints to a verified,
cached, ready-to-run weight set).

    python -m pnpinversion_tpu.convert --root CKPTS [--manifest OUT.json]

converts every model family it finds, and for each one:

1. loads the raw state dict behind a TrackingDict,
2. converts it to our param tree,
3. asserts EVERY checkpoint key was consumed (minus a documented ignore set),
4. asserts the output tree is structurally identical (treedef + leaf shapes)
   to the model's init tree — every leaf filled,
5. runs a forward smoke (finite outputs on a fixed input) and, where the
   source directory is also loadable by transformers (config.json present),
   a numeric oracle against the torch forward,
6. caches the converted tree with orbax exactly where the runtime loaders
   look (convert/checkpoint.py `CACHE_SUBDIR` layout), and
7. records it all in a JSON manifest.

Default layout under --root (every entry optional; each can be overridden
with its own flag, and absolute flags work without --root):

    root/
      unet/ vae/ text_encoder/ [tokenizer/]   # SD1.4 HF pipeline dir = root
      sd21/                                   # SD2.1 HF pipeline dir
      ip2p.ckpt                               # LDM instruct-pix2pix ckpt
      instructdiffusion.ckpt                  # LDM InstructDiffusion ckpt
      clip/  dino/  lpips/  blip/ [blip_tokenizer/]   # metric/caption models

Reference anchors: the reference pulls SD1.4 from the HF hub at editor init
(/root/reference/models/p2p_editor.py:18-25) and torch.loads the LDM ckpts
(/root/reference/run_editing_instructpix2pix.py:49-70); its metric models
come from torchmetrics / torch.hub (evaluation/matrics_calculator.py:271-288).
This CLI replaces all of that with a single offline converting pass.
"""
from __future__ import annotations

import argparse
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np

from pnpinversion_tpu.configs import IP2P, SD14, SD21, StableDiffusionConfig
from pnpinversion_tpu.convert.checkpoint import CACHE_SUBDIR, _orbax_save
from pnpinversion_tpu.convert.export import KNOWN_IGNORED_KEYS, TrackingDict
from pnpinversion_tpu.convert.metric_models import (
    convert_blip_decoder,
    convert_clip_vision,
    convert_dino_vit,
    convert_lpips_squeeze,
)
from pnpinversion_tpu.convert.torch_to_jax import (
    convert_clip_text,
    convert_unet,
    convert_vae,
    load_state_dict,
)

# LDM checkpoints carry training-time state the benchmark never consumes:
# EMA shadows, the diffusion buffer bank (betas/alphas/posterior_*), loss
# weights. Everything outside these prefixes must land in one of the three
# model prefixes and be consumed by its converter.
_LDM_IGNORED_PREFIXES = (
    "model_ema.", "betas", "alphas_cumprod", "sqrt_", "log_one_minus",
    "posterior_", "lvlb_weights", "logvar", "scale_factor",
)
_LDM_MODEL_PREFIXES = ("model.diffusion_model.", "first_stage_model.",
                       "cond_stage_model.transformer.")


def _tree_report(converted, shapes) -> Dict[str, Any]:
    """Structural identity vs the init tree: same treedef, same leaf shapes."""
    got_leaves, got_def = jax.tree.flatten(converted)
    want_leaves, want_def = jax.tree.flatten(shapes)
    if got_def != want_def:
        raise ValueError(f"converted treedef != init treedef:\n{got_def}\nvs\n{want_def}")
    for g, w in zip(got_leaves, want_leaves):
        if tuple(np.shape(g)) != tuple(w.shape):
            raise ValueError(f"leaf shape {np.shape(g)} != init {w.shape}")
        if not np.all(np.isfinite(np.asarray(g, np.float32))):
            raise ValueError("non-finite values in converted leaf")
    return {"leaves_filled": len(got_leaves)}


def _consumed(sd: TrackingDict, ignore=()) -> Dict[str, Any]:
    ignored = {k for k in sd.unread_keys()
               if k in KNOWN_IGNORED_KEYS
               or any(k.startswith(p) for p in ignore)}
    unread = set(sd.unread_keys()) - ignored
    if unread:
        raise ValueError(f"{len(unread)} checkpoint keys NOT consumed, e.g. "
                         f"{sorted(unread)[:5]}")
    # keys_total excludes documented non-parameter buffers (position_ids
    # etc.) so consumed == total is the invariant weight-day asserts
    return {"keys_total": len(sd) - len(ignored),
            "keys_consumed": len(sd.accessed), "keys_ignored": len(ignored)}


def _forward_smoke(kind: str, params, config: StableDiffusionConfig) -> Dict[str, Any]:
    """Tiny fixed-input forward on each tower; records output stats so two
    weight-days can be diffed."""
    import jax.numpy as jnp

    from pnpinversion_tpu.models.clip_text import clip_text_apply
    from pnpinversion_tpu.models.unet import unet_apply
    from pnpinversion_tpu.models.vae import vae_decode, vae_encode_moments

    out: Dict[str, Any] = {}
    if kind == "unet":
        s = min(config.unet.sample_size, 32)
        x = jnp.ones((1, s, s, config.unet.in_channels)) * 0.1
        ctx = jnp.ones((1, 77, config.unet.context_dim)) * 0.02
        eps, _ = unet_apply(params, x, jnp.int32(500), ctx, config.unet)
        arr = np.asarray(eps, np.float32)
    elif kind == "vae":
        x = jnp.ones((1, 64, 64, 3)) * 0.25
        mean, _ = vae_encode_moments(params, x, config.vae)
        img = vae_decode(params, mean, config.vae)
        arr = np.asarray(img, np.float32)
    else:  # text
        ids = jnp.arange(77, dtype=jnp.int32)[None] % config.text.vocab_size
        arr = np.asarray(clip_text_apply(params, ids, config.text), np.float32)
    if not np.all(np.isfinite(arr)):
        raise ValueError(f"{kind} forward produced non-finite output")
    out["forward"] = {"mean": float(arr.mean()), "std": float(arr.std()),
                      "shape": list(arr.shape)}
    return out


def _oracle_clip_text(hf_dir: str, params, config) -> Optional[Dict[str, Any]]:
    """Numeric parity vs the torch forward of the SAME checkpoint, when
    transformers can load it (config.json present). Returns None when not."""
    te = os.path.join(hf_dir, "text_encoder")
    if not os.path.exists(os.path.join(te, "config.json")):
        return None
    try:
        import torch
        from transformers import CLIPTextModel

        from pnpinversion_tpu.models.clip_text import clip_text_apply

        model = CLIPTextModel.from_pretrained(te).eval()
        ids = np.arange(77, dtype=np.int64)[None] % config.text.vocab_size
        with torch.no_grad():
            ref = model(torch.from_numpy(ids)).last_hidden_state.numpy()
        import jax.numpy as jnp

        ours = np.asarray(clip_text_apply(params, jnp.asarray(ids, jnp.int32),
                                          config.text))
        return {"max_abs_diff": float(np.abs(ours - ref).max())}
    except Exception as exc:  # noqa: BLE001 - oracle is best-effort, recorded
        return {"skipped": repr(exc)[:200]}


def convert_sd_dir(hf_dir: str, config: StableDiffusionConfig) -> Dict[str, Any]:
    """HF pipeline dir (unet/ vae/ text_encoder/) -> verified + cached."""
    from pnpinversion_tpu.models.clip_text import init_clip_text_params
    from pnpinversion_tpu.models.unet import init_unet_params
    from pnpinversion_tpu.models.vae import init_vae_params

    report: Dict[str, Any] = {"source": hf_dir, "config": config.name}
    params: Dict[str, Any] = {}
    for sub, conv, init, cfg in [
        ("unet", convert_unet, init_unet_params, config.unet),
        ("vae", convert_vae, init_vae_params, config.vae),
        ("text_encoder", convert_clip_text, init_clip_text_params, config.text),
    ]:
        name = {"text_encoder": "text"}.get(sub, sub)
        sd = TrackingDict(load_state_dict(os.path.join(hf_dir, sub)))
        tree = conv(sd, cfg)
        rep = _consumed(sd)
        shapes = jax.eval_shape(lambda k, init=init, cfg=cfg: init(k, cfg),
                                jax.random.PRNGKey(0))
        rep.update(_tree_report(tree, shapes))
        rep.update(_forward_smoke(name, tree, config))
        report[name] = rep
        params[name] = jax.tree.map(lambda x: np.asarray(x, np.float32), tree)
    oracle = _oracle_clip_text(hf_dir, params["text"], config)
    if oracle is not None:
        report["text"]["oracle_vs_transformers"] = oracle
    cache_dir = os.path.join(hf_dir, CACHE_SUBDIR, config.name)
    _orbax_save(cache_dir, params)
    report["cached_to"] = cache_dir
    return report


def convert_ldm_ckpt(path: str, config: StableDiffusionConfig) -> Dict[str, Any]:
    """Single LDM .ckpt file -> verified + cached so SDPipeline.create's
    checkpoint_dir=dirname(path) cache-hit path finds it."""
    from pnpinversion_tpu.models.clip_text import init_clip_text_params
    from pnpinversion_tpu.models.unet import init_unet_params
    from pnpinversion_tpu.models.vae import init_vae_params

    import torch

    from pnpinversion_tpu.convert.ldm_to_jax import (
        _remap_ldm_vae,
        convert_ldm_unet,
        strip_prefix,
    )

    raw = torch.load(path, map_location="cpu", weights_only=True)
    if "state_dict" in raw:
        raw = raw["state_dict"]
    full = {k: v.float().numpy() for k, v in raw.items()}
    report: Dict[str, Any] = {"source": path, "config": config.name}

    # every key must be training-time state or belong to one of the three
    # model prefixes (whose converters then account for each key below)
    stray = [k for k in full
             if not any(k.startswith(p) for p in
                        _LDM_MODEL_PREFIXES + _LDM_IGNORED_PREFIXES)
             and k not in KNOWN_IGNORED_KEYS]
    if stray:
        raise ValueError(f"{len(stray)} unrecognized LDM keys, e.g. {stray[:5]}")

    parts = {
        "unet": (TrackingDict(strip_prefix(full, "model.diffusion_model.")),
                 lambda sd: convert_ldm_unet(sd, config.unet),
                 init_unet_params, config.unet),
        "vae": (TrackingDict(_remap_ldm_vae(
                    strip_prefix(full, "first_stage_model."), config.vae)),
                lambda sd: convert_vae(sd, config.vae),
                init_vae_params, config.vae),
        "text": (TrackingDict(strip_prefix(full, "cond_stage_model.transformer.")),
                 lambda sd: convert_clip_text(sd, config.text),
                 init_clip_text_params, config.text),
    }
    tree: Dict[str, Any] = {}
    for name, (sd, conv, init, cfg) in parts.items():
        tree[name] = conv(sd)
        rep = _consumed(sd)
        shapes = jax.eval_shape(lambda k, init=init, cfg=cfg: init(k, cfg),
                                jax.random.PRNGKey(0))
        rep.update(_tree_report(tree[name], shapes))
        rep.update(_forward_smoke(name, tree[name], config))
        report[name] = rep
    tree = jax.tree.map(lambda x: np.asarray(x, np.float32), tree)
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(path)),
                             CACHE_SUBDIR, config.name)
    _orbax_save(cache_dir, tree)
    report["cached_to"] = cache_dir
    return report


def convert_metric_dir(root: str, clip=None, dino=None, lpips=None,
                       blip=None, clip_cfg=None, dino_cfg=None,
                       blip_text_cfg=None, clip_text_cfg=None) -> Dict[str, Any]:
    """clip/ dino/ lpips/ blip/ dirs -> verified + cached under
    root/pnpi_tpu_params/{clip_vision,clip_text,clip_text_proj,dino,lpips,
    blip_vision,blip_decoder} (where MetricsCalculator / make_blip_captioner
    look). The cfg overrides exist so tests can drive tiny checkpoints
    through the exact same code path."""
    from pnpinversion_tpu.models import vit
    from pnpinversion_tpu.models.blip import (
        BlipTextConfig,
        init_blip_decoder_params,
    )
    from pnpinversion_tpu.models.lpips import init_lpips_params

    clip_cfg = clip_cfg or vit.CLIP_VIT_L14
    dino_cfg = dino_cfg or vit.DINO_VITB8
    blip_text_cfg = blip_text_cfg or BlipTextConfig()
    report: Dict[str, Any] = {}
    out: Dict[str, Any] = {}

    clip = clip or os.path.join(root, "clip")
    if os.path.isdir(clip):
        sd = TrackingDict(load_state_dict(clip))
        out["clip_vision"] = convert_clip_vision(sd, layers=clip_cfg.layers)
        text_sd = {k[len("text_model."):]: v for k, v in sd.items()
                   if k.startswith("text_model.")}
        out["clip_text"] = (convert_clip_text(text_sd, clip_text_cfg)
                            if clip_text_cfg is not None
                            else convert_clip_text(text_sd))
        if "text_projection.weight" in sd:
            out["clip_text_proj"] = {"kernel": np.ascontiguousarray(
                sd["text_projection.weight"].T)}
        rep = {"source": clip, "keys_total": len(sd),
               "keys_consumed": len(sd.accessed)}
        shapes = jax.eval_shape(lambda k: vit.init_vit_params(k, clip_cfg),
                                jax.random.PRNGKey(0))
        rep.update(_tree_report(out["clip_vision"], shapes))
        report["clip"] = rep

    dino = dino or os.path.join(root, "dino")
    if os.path.isdir(dino):
        sd = TrackingDict(load_state_dict(dino))
        out["dino"] = convert_dino_vit(sd, layers=dino_cfg.layers)
        rep = _consumed(sd)
        rep["source"] = dino
        # DINO's timm-style patch conv has a bias the random-init tree omits
        # (vit_apply gates on its presence) — compare leaf counts instead
        rep["leaves_filled"] = len(jax.tree.leaves(out["dino"]))
        report["dino"] = rep

    lpips = lpips or os.path.join(root, "lpips")
    if os.path.isdir(lpips):
        sd = TrackingDict(load_state_dict(lpips))
        out["lpips"] = convert_lpips_squeeze(sd, sd)
        shapes = jax.eval_shape(init_lpips_params, jax.random.PRNGKey(0))
        rep = {"source": lpips, "keys_total": len(sd),
               "keys_consumed": len(sd.accessed)}
        rep.update(_tree_report(out["lpips"], shapes))
        report["lpips"] = rep

    blip = blip or os.path.join(root, "blip")
    if os.path.isdir(blip):
        sd = load_state_dict(blip)
        vis_sd = TrackingDict({k[len("visual_encoder."):]: v
                               for k, v in sd.items()
                               if k.startswith("visual_encoder.")})
        dec_sd = TrackingDict({k: v for k, v in sd.items()
                               if k.startswith("text_decoder.")})
        out["blip_vision"] = convert_dino_vit(
            vis_sd, layers=sum(1 for k in vis_sd
                               if k.endswith(".attn.qkv.weight")))
        out["blip_decoder"] = convert_blip_decoder(
            dec_sd, layers=blip_text_cfg.layers)
        rep = {"source": blip, "keys_total": len(sd)}
        rep["vision_keys"] = _consumed(vis_sd)
        rep["decoder_keys"] = _consumed(dec_sd)
        shapes = jax.eval_shape(
            lambda k: init_blip_decoder_params(k, blip_text_cfg),
            jax.random.PRNGKey(0))
        rep.update(_tree_report(out["blip_decoder"], shapes))
        rep["vision_leaves_filled"] = len(jax.tree.leaves(out["blip_vision"]))
        report["blip"] = rep

    for name, params in out.items():
        path = os.path.join(root, CACHE_SUBDIR, name)
        _orbax_save(path, jax.tree.map(lambda x: np.asarray(x, np.float32),
                                       params))
        report.setdefault("cached", []).append(path)
    return report


def main(argv=None) -> Dict[str, Any]:
    ap = argparse.ArgumentParser(
        prog="python -m pnpinversion_tpu.convert",
        description="convert + verify + cache every model family's weights")
    ap.add_argument("--root", type=str, default=None,
                    help="checkpoint root (default layout; see module doc)")
    ap.add_argument("--sd14", type=str, default=None,
                    help="HF SD1.4 pipeline dir (default: --root itself)")
    ap.add_argument("--sd21", type=str, default=None)
    ap.add_argument("--ip2p", type=str, default=None,
                    help="LDM instruct-pix2pix .ckpt")
    ap.add_argument("--instructdiffusion", type=str, default=None,
                    help="LDM InstructDiffusion .ckpt")
    ap.add_argument("--clip", type=str, default=None)
    ap.add_argument("--dino", type=str, default=None)
    ap.add_argument("--lpips", type=str, default=None)
    ap.add_argument("--blip", type=str, default=None)
    ap.add_argument("--manifest", type=str, default=None,
                    help="output JSON (default <root>/conversion_manifest.json)")
    args = ap.parse_args(argv)

    root = args.root or "."
    manifest: Dict[str, Any] = {"root": os.path.abspath(root), "models": {}}

    def _try(name, fn):
        try:
            manifest["models"][name] = fn()
            print(f"[convert] {name}: ok")
        except FileNotFoundError as exc:
            manifest["models"][name] = {"skipped": str(exc)[:200]}
            print(f"[convert] {name}: skipped ({exc})")

    sd14 = args.sd14 or (root if os.path.isdir(os.path.join(root, "unet"))
                         else os.path.join(root, "sd14"))
    if os.path.isdir(os.path.join(sd14, "unet")):
        _try("sd14", lambda: convert_sd_dir(sd14, SD14))
    else:
        manifest["models"]["sd14"] = {"skipped": f"no HF dir at {sd14}"}
    sd21 = args.sd21 or os.path.join(root, "sd21")
    if os.path.isdir(os.path.join(sd21, "unet")):
        _try("sd21", lambda: convert_sd_dir(sd21, SD21))
    else:
        manifest["models"]["sd21"] = {"skipped": f"no HF dir at {sd21}"}

    for name, arg, pats in [
        ("ip2p", args.ip2p, ("ip2p", "instruct-pix2pix")),
        ("instructdiffusion", args.instructdiffusion,
         ("instructdiffusion", "v1-5-pretrained")),
    ]:
        path = arg
        if path is None and os.path.isdir(root):
            cands = [f for f in sorted(os.listdir(root))
                     if f.endswith(".ckpt") and any(p in f for p in pats)]
            path = os.path.join(root, cands[0]) if cands else None
        if path and os.path.isfile(path):
            _try(name, lambda p=path: convert_ldm_ckpt(p, IP2P))
        else:
            manifest["models"][name] = {"skipped": "no .ckpt found"}

    manifest["models"]["metrics"] = convert_metric_dir(
        root, clip=args.clip, dino=args.dino, lpips=args.lpips, blip=args.blip)

    out_path = args.manifest or os.path.join(root, "conversion_manifest.json")
    with open(out_path, "w") as f:
        json.dump(manifest, f, indent=2)
    print(f"[convert] manifest -> {out_path}")
    return manifest


if __name__ == "__main__":
    main()
