"""dp-sharded batched evaluation.

The reference evaluates the 700-image table strictly serially — one
(method, image, metric) triple at a time through torchmetrics on one GPU
(/root/reference/evaluation/evaluate.py:177-284). Here the per-item metric
stack (closed-form PSNR/MSE/SSIM, LPIPS-squeeze, CLIPScore, DINO structure
distance) is one jitted function vmapped over an image batch and sharded
over a ``('dp',)`` mesh, so a v5e-8 scores 8+ images per step. Semantics are
identical to evaluation/calculator.py (masked-before-metric quirk, 0..255
DINO quirk, first-EOS CLIP pooling); the "nan" sentinels for empty/full
masks stay host-side in the driver.
"""
from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pnpinversion_tpu.evaluation import metrics as M
from pnpinversion_tpu.evaluation.calculator import MetricsCalculator
from pnpinversion_tpu.models import lpips as lpips_mod
from pnpinversion_tpu.models import vit
from pnpinversion_tpu.models.clip_text import clip_text_apply
from pnpinversion_tpu.models.layers import linear
from pnpinversion_tpu.parallel.sweep import make_dp_mesh, pad_batch

Array = jax.Array

#: metrics the batched path can compute on device; anything else falls back
#: to the serial calculator in the driver
SUPPORTED = (
    "psnr", "mse", "ssim", "lpips", "structure_distance",
    "psnr_unedit_part", "mse_unedit_part", "ssim_unedit_part",
    "lpips_unedit_part", "structure_distance_unedit_part",
    "psnr_edit_part", "mse_edit_part", "ssim_edit_part", "lpips_edit_part",
    "structure_distance_edit_part",
    "clip_similarity_source_image", "clip_similarity_target_image",
    "clip_similarity_target_image_edit_part",
)


class ShardedEvaluator:
    """Batched evaluation over ``calc``'s metric models and mesh ``mesh``."""

    def __init__(self, calc: MetricsCalculator, mesh: Optional[Mesh] = None):
        self.calc = calc
        self.mesh = mesh if mesh is not None else make_dp_mesh()
        self._cache: Dict[Any, Any] = {}

    # ------------------------------------------------------------- text side
    def text_features(self, prompts: Sequence[str]) -> np.ndarray:
        """Batched CLIP text features (N, proj_dim), first-EOS pooled."""
        calc = self.calc
        ids = calc.tokenizer(list(prompts),
                             max_length=calc.clip_text_cfg.max_length)["input_ids"]
        ids = jnp.asarray(np.asarray(ids, np.int32))
        eos_id = getattr(calc.tokenizer, "eos_token_id", None)
        key = ("txt", eos_id)
        if key not in self._cache:
            cfg = calc.clip_text_cfg

            def fn(p, proj, ids):
                h = clip_text_apply(p, ids, cfg)
                if eos_id is None:
                    pos = jnp.argmax(ids, axis=1)
                else:
                    pos = jnp.argmax((ids == eos_id).astype(jnp.int32), axis=1)
                pooled = jnp.take_along_axis(h, pos[:, None, None], axis=1)[:, 0]
                return jax.vmap(lambda row: linear(proj, row))(pooled)

            self._cache[key] = jax.jit(fn)
        return np.asarray(self._cache[key](
            calc.params["clip_text"], calc.params["clip_text_proj"], ids))

    # ------------------------------------------------------------ image side
    def _fn(self, metrics: Tuple[str, ...]):
        if metrics in self._cache:
            return self._cache[metrics]
        calc = self.calc
        clip_cfg, dino_cfg = calc.clip_vision_cfg, calc.dino_cfg

        def clip_image_feat(params, img01):
            x = M.center_crop_resize_224(img01, clip_cfg.image_size)
            x = M.clip_normalize(x)
            emb, _ = vit.vit_apply(params["clip_vision"], x[None], clip_cfg)
            return emb[0]

        def clip_sim(params, img01, txt_feat):
            ie = clip_image_feat(params, img01)
            cos = jnp.sum(ie * txt_feat) / (
                jnp.linalg.norm(ie) * jnp.linalg.norm(txt_feat))
            return jnp.maximum(100.0 * cos, 0.0)

        def struct_dist(params, a255, b255):
            size = dino_cfg.image_size
            a = jax.image.resize(a255, (size, size, 3), method="bilinear")
            b = jax.image.resize(b255, (size, size, 3), method="bilinear")
            return vit.structure_distance(
                params["dino"], M.imagenet_normalize(a)[None],
                M.imagenet_normalize(b)[None], dino_cfg,
                layer=dino_cfg.layers - 1)

        def pair_metric(name, params, s01, t01):
            if name == "psnr":
                return M.psnr(s01, t01)
            if name == "mse":
                return M.mse(s01, t01)
            if name == "ssim":
                return M.ssim(s01, t01)
            if name == "lpips":
                return lpips_mod.lpips(params["lpips"], s01[None] * 2 - 1,
                                       t01[None] * 2 - 1)
            if name == "structure_distance":
                # reference quirk: raw 0..255 floats into the imagenet
                # normalizer, gt first (matrics_calculator.py:382-391)
                return struct_dist(params, s01 * 255.0, t01 * 255.0)
            raise ValueError(name)

        def per_item(params, src01, tgt01, mask, src_txt, tgt_txt):
            """src01/tgt01 (H,W,3) in [0,1]; mask (H,W,3) in {0,1}."""
            out = {}
            for m in metrics:
                if m == "clip_similarity_source_image":
                    out[m] = clip_sim(params, src01, src_txt)
                elif m == "clip_similarity_target_image":
                    out[m] = clip_sim(params, tgt01, tgt_txt)
                elif m == "clip_similarity_target_image_edit_part":
                    out[m] = clip_sim(params, tgt01 * mask, tgt_txt)
                elif m.endswith("_unedit_part"):
                    base = m[: -len("_unedit_part")]
                    out[m] = pair_metric(base, params, src01 * (1 - mask),
                                         tgt01 * (1 - mask))
                elif m.endswith("_edit_part"):
                    base = m[: -len("_edit_part")]
                    out[m] = pair_metric(base, params, src01 * mask,
                                         tgt01 * mask)
                else:
                    out[m] = pair_metric(m, params, src01, tgt01)
            return out

        batched = jax.vmap(per_item, in_axes=(None, 0, 0, 0, 0, 0))
        repl = NamedSharding(self.mesh, P())
        shard = NamedSharding(self.mesh, P("dp"))
        fn = jax.jit(batched,
                     in_shardings=(repl, shard, shard, shard, shard, shard),
                     out_shardings=shard)
        self._cache[metrics] = fn
        return fn

    def evaluate_batch(self, metrics: Sequence[str], src_imgs_u8: np.ndarray,
                       tgt_imgs_u8: np.ndarray, masks: np.ndarray,
                       src_prompts: Sequence[str], tgt_prompts: Sequence[str],
                       ) -> Dict[str, np.ndarray]:
        """All arrays have leading N. masks: (N,H,W,3) in {0,1}.
        Returns {metric: (N,) float array}; pads N internally to the mesh
        size. "nan" sentinel decisions stay with the caller."""
        for m in metrics:
            if m not in SUPPORTED:
                raise ValueError(f"unsupported batched metric {m!r}")
        n = len(src_imgs_u8)
        mult = self.mesh.devices.size
        src_b, _ = pad_batch(list(np.asarray(src_imgs_u8)), mult)
        tgt_b, _ = pad_batch(list(np.asarray(tgt_imgs_u8)), mult)
        mask_b, _ = pad_batch(list(np.asarray(masks).astype(np.float32)), mult)
        src_feats = self.text_features(src_prompts)
        tgt_feats = self.text_features(tgt_prompts)
        sf_b, _ = pad_batch(list(src_feats), mult)
        tf_b, _ = pad_batch(list(tgt_feats), mult)
        with self.mesh:
            out = self._fn(tuple(metrics))(
                self.calc.params,
                jnp.asarray(src_b, jnp.float32) / 255.0,
                jnp.asarray(tgt_b, jnp.float32) / 255.0,
                jnp.asarray(mask_b), jnp.asarray(sf_b), jnp.asarray(tf_b))
        return {m: np.asarray(v)[:n] for m, v in out.items()}
