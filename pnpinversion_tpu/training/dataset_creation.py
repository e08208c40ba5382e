"""InstructPix2Pix training-data generation: P2P pairs + CLIP filtering.

TPU-native replacement for
``models/instructpix2pix/dataset_creation/generate_img_dataset.py`` (:50-67
modified Euler-ancestral sampler with self-attention prompt-to-prompt,
:239-309 per-prompt sample/filter/save loop), ``metrics/clip_similarity.py``
(ClipSimilarity: per-image text sim, directional sim, image-image sim), and
``dataset_creation/prepare_dataset.py`` (seeds.json index).
``generate_txt_dataset.py`` prompts a fine-tuned GPT-3 — an external paid
API with no local equivalent; this module consumes its OUTPUT format (a
.jsonl of {"caption", "edit", "output"} records, which is also what the
released 454k-prompt dataset ships as).

Design notes (TPU-first, not a port):

- The reference flips a ``prompt_to_prompt`` flag on every vendored
  CrossAttention module per step and overwrites the self-attention *softmax
  logits* of the second prompt's rows with the first's
  (``sims = (sims[0], sims[0], sims[2], sims[2])``, attention.py:189-194).
  Copying logits row0->row1 is algebraically identical to computing
  attention with row 0's q,k against row 1's v — so here the control is a
  ``qkv_hook`` q/k swap and the flash-attention path is preserved (no
  (B,H,S,S) probs ever materialize). The per-sample threshold is a traced
  scalar; step gating lowers to ``jnp.where``.
- One jitted program generates a whole BATCH of candidate pairs per
  dispatch: ``vmap`` over samples (each an internal batch-4 CFG pair with
  its own rng/threshold/cfg-scale), ``lax.scan`` over sampler steps.
- The ancestral noise is shared across the pair (reference
  ``torch.randn_like(x[:1])``, generate_img_dataset.py:66) and the initial
  latent is shared too (:261-262).
- CLIP filtering runs batched on device; thresholds/sort/save are host-side.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from pnpinversion_tpu.control.base import AttnSite, BaseControl
from pnpinversion_tpu.models.unet import unet_apply
from pnpinversion_tpu.models.vae import latent_to_image
from pnpinversion_tpu.models import vit
from pnpinversion_tpu.models.clip_text import clip_text_apply, init_clip_text_params
from pnpinversion_tpu.configs import CLIPTextConfig
from pnpinversion_tpu.models.layers import init_linear, linear
from pnpinversion_tpu.sampling.kdiffusion import (
    get_ancestral_step,
    get_sigmas,
    sigma_to_t,
)
from pnpinversion_tpu.utils.tokenizer import default_tokenizer

Array = jax.Array


class SelfAttnShareControl(BaseControl):
    """Share prompt-1's self-attention with prompt-2 for the first
    ``thr`` fraction of sampling steps.

    Batch layout (generate_img_dataset.py CFGDenoiser :102-107): rows
    [uncond/caption, uncond/output, cond/caption, cond/output]. The
    reference copies softmax logits rows (0,0,2,2) on self-attention when
    ``thr > i/(steps-1)`` (:54, :189-194); swapping q,k of rows 1,3 for
    rows 0,2's computes the same attention weights without materializing
    the (B,H,S,S) map.
    """

    def __init__(self, num_steps: int):
        self.num_steps = num_steps

    def qkv_hook(self, site: AttnSite, q, k, v, tensors, state, step):
        if site.is_cross:
            return q, k, v
        frac = step.astype(jnp.float32) / max(self.num_steps - 1, 1)
        active = tensors["p2p_thr"] > frac
        idx = jnp.array([0, 0, 2, 2])
        return jnp.where(active, q[idx], q), jnp.where(active, k[idx], k), v


def sample_shared_pair(
    unet_params,
    schedule,
    unet_config,
    ctx_pair: Array,    # (2, 77, W) [caption, output]
    uncond_ctx: Array,  # (1, 77, W)
    cfg_scale: Array,   # scalar
    p2p_thr: Array,     # scalar in [0,1]
    steps: int,
    latent_hw: int,
    rng: Array,
    control: SelfAttnShareControl,
    dtype=jnp.float32,
) -> Array:
    """One candidate pair: Euler-ancestral from shared noise with P2P
    self-attention sharing. Returns (2, h, w, 4) scaled latents."""
    sigmas = get_sigmas(schedule, steps).astype(jnp.float32)
    k0, kloop = jax.random.split(rng)
    x0 = jax.random.normal(k0, (1, latent_hw, latent_hw, 4), dtype) * sigmas[0].astype(dtype)
    x = jnp.broadcast_to(x0, (2,) + x0.shape[1:])
    ctx4 = jnp.concatenate([uncond_ctx, uncond_ctx, ctx_pair], axis=0).astype(dtype)
    tensors = {"p2p_thr": p2p_thr}

    def body(carry, i):
        x, key = carry
        key, kn = jax.random.split(key)
        sigma = sigmas[i]
        c_in = (1.0 / (1.0 + sigma**2) ** 0.5).astype(dtype)
        t = sigma_to_t(schedule, sigma)
        x4 = jnp.concatenate([x, x], axis=0) * c_in
        eps4, _ = unet_apply(unet_params, x4, t, ctx4, unet_config,
                             control=control, tensors=tensors, state={},
                             step=i)
        e_unc, e_cond = eps4[:2].astype(jnp.float32), eps4[2:].astype(jnp.float32)
        eps = e_unc + cfg_scale * (e_cond - e_unc)
        denoised = x.astype(jnp.float32) - sigma * eps
        sigma_down, sigma_up = get_ancestral_step(sigma, sigmas[i + 1])
        d = (x.astype(jnp.float32) - denoised) / sigma
        x = x.astype(jnp.float32) + d * (sigma_down - sigma)
        # noise shared across the pair (randn_like(x[:1]), :66)
        noise = jax.random.normal(kn, (1,) + x.shape[1:], jnp.float32)
        x = x + noise * jnp.where(sigmas[i + 1] > 0, sigma_up, 0.0)
        return (x.astype(dtype), key), ()

    (x, _), _ = jax.lax.scan(body, (x, kloop), jnp.arange(steps))
    return x


class PairGenerator:
    """Owns the jitted batched pair sampler + decoder for one pipeline."""

    def __init__(self, pipe, steps: int):
        self.pipe = pipe
        self.steps = steps
        self.control = SelfAttnShareControl(steps)
        hw = pipe.latent_size
        self.image_size = pipe.config.vae.sample_size

        def batched(unet_params, ctx_pair, uncond_ctx, cfgs, thrs, keys):
            fn = lambda cfg, thr, key: sample_shared_pair(
                unet_params, pipe.schedule, pipe.config.unet, ctx_pair,
                uncond_ctx, cfg, thr, steps, hw, key, self.control,
                dtype=pipe.dtype)
            return jax.vmap(fn)(cfgs, thrs, keys)

        self._sample = jax.jit(batched)
        self._decode = jax.jit(
            lambda p, z: latent_to_image(p, z, pipe.config.vae))

    def __call__(self, caption: str, output: str, seeds: Sequence[int],
                 cfgs: np.ndarray, thrs: np.ndarray) -> np.ndarray:
        """Generate len(seeds) candidate pairs; returns uint8 (n, 2, S, S, 3)."""
        pipe = self.pipe
        ctx_pair = pipe.encode_prompt([caption, output])
        uncond = pipe.encode_prompt([""])
        keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        z = self._sample(pipe.params["unet"], ctx_pair, uncond,
                         jnp.asarray(cfgs, jnp.float32),
                         jnp.asarray(thrs, jnp.float32), keys)
        n = z.shape[0]
        imgs = self._decode(pipe.params["vae"],
                            z.reshape((2 * n,) + z.shape[2:]))
        return np.asarray(jax.device_get(imgs)).reshape(
            (n, 2) + imgs.shape[1:])


class PairClipFilter:
    """Batched CLIP similarity scores for candidate pairs.

    Parity: metrics/clip_similarity.py (ViT-L/14, bicubic resize of the
    [0,1] image to 224, CLIP normalization; cosine sims: image0<->text0,
    image1<->text1, directional (i1-i0)<->(t1-t0), image<->image).
    """

    def __init__(self, rng: Optional[Array] = None,
                 checkpoint_dir: Optional[str] = None, tokenizer=None,
                 tiny: bool = False):
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2, k3 = jax.random.split(rng, 3)
        self.tokenizer = tokenizer or default_tokenizer(checkpoint_dir)
        if tiny:
            self.vision_cfg = vit.TINY_VIT
            self.text_cfg = CLIPTextConfig(vocab_size=128, width=32,
                                           layers=2, heads=2)
            self.proj_dim = 16
        else:
            self.vision_cfg = vit.CLIP_VIT_L14
            self.text_cfg = CLIPTextConfig()
            self.proj_dim = 768
        self.params = {
            "clip_vision": vit.init_vit_params(k1, self.vision_cfg),
            "clip_text": init_clip_text_params(k2, self.text_cfg),
            "clip_text_proj": init_linear(k3, self.text_cfg.width,
                                          self.proj_dim, use_bias=False),
        }
        if checkpoint_dir is not None:
            from pnpinversion_tpu.convert.checkpoint import load_metric_params

            loaded = load_metric_params(checkpoint_dir)
            self.params.update({k: loaded[k] for k in self.params
                                if k in loaded})
        self._jit_scores = None
        self._jit_text: Dict[Any, Any] = {}

    def _image_features(self, p, img01: Array) -> Array:
        size = self.vision_cfg.image_size
        x = jax.image.resize(
            img01, (img01.shape[0], size, size, 3), method="bicubic")
        mean = jnp.array([0.48145466, 0.4578275, 0.40821073])
        std = jnp.array([0.26862954, 0.26130258, 0.27577711])
        x = (x - mean) / std
        emb, _ = vit.vit_apply(p, x, self.vision_cfg)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def _text_features(self, texts: Sequence[str]) -> Array:
        ids = self.tokenizer(list(texts), padding="max_length",
                             max_length=self.text_cfg.max_length,
                             truncation=True)["input_ids"]
        ids = jnp.asarray(np.asarray(ids, np.int32))
        eos_id = getattr(self.tokenizer, "eos_token_id", None)

        def fn(p, proj, ids):
            h = clip_text_apply(p, ids, self.text_cfg)
            if eos_id is None:
                pos = jnp.argmax(ids, axis=-1)
            else:
                pos = jnp.argmax((ids == eos_id).astype(jnp.int32), axis=-1)
            e = linear(proj, jnp.take_along_axis(
                h, pos[:, None, None], axis=1)[:, 0])
            return e / jnp.linalg.norm(e, axis=-1, keepdims=True)

        if eos_id not in self._jit_text:
            self._jit_text[eos_id] = jax.jit(fn)
        return self._jit_text[eos_id](self.params["clip_text"],
                                      self.params["clip_text_proj"], ids)

    def scores(self, pairs_u8: np.ndarray, caption: str, output: str) -> Dict[str, np.ndarray]:
        """pairs_u8: (n, 2, S, S, 3) uint8. Returns 4 float arrays of len n."""
        te = self._text_features([caption, output])

        if self._jit_scores is None:
            def fn(p, img0, img1, t0, t1):
                f0 = self._image_features(p, img0)
                f1 = self._image_features(p, img1)
                cos = lambda a, b: jnp.sum(a * b, axis=-1)
                return {
                    "clip_sim_0": cos(f0, t0[None]),
                    "clip_sim_1": cos(f1, t1[None]),
                    "clip_sim_dir": cos(
                        (f1 - f0) / jnp.maximum(
                            jnp.linalg.norm(f1 - f0, axis=-1, keepdims=True), 1e-12),
                        ((t1 - t0) / jnp.maximum(
                            jnp.linalg.norm(t1 - t0), 1e-12))[None]),
                    "clip_sim_image": cos(f0, f1),
                }

            self._jit_scores = jax.jit(fn)

        img01 = jnp.asarray(pairs_u8.astype(np.float32) / 255.0)
        out = self._jit_scores(self.params["clip_vision"],
                               img01[:, 0], img01[:, 1], te[0], te[1])
        return {k: np.asarray(jax.device_get(v)) for k, v in out.items()}


@dataclasses.dataclass(frozen=True)
class FilterThresholds:
    """generate_img_dataset.py defaults (:196-213)."""

    clip_threshold: float = 0.2
    clip_dir_threshold: float = 0.2
    clip_img_threshold: float = 0.7


def filter_results(results: Dict[int, Dict[str, Any]],
                   thresholds: FilterThresholds,
                   max_out_samples: int) -> List[int]:
    """Seeds passing all CLIP thresholds, best-directional first, top-k
    (generate_img_dataset.py:292-302)."""
    metadata = [
        (r["clip_sim_dir"], seed) for seed, r in results.items()
        if r["clip_sim_image"] >= thresholds.clip_img_threshold
        and r["clip_sim_dir"] >= thresholds.clip_dir_threshold
        and r["clip_sim_0"] >= thresholds.clip_threshold
        and r["clip_sim_1"] >= thresholds.clip_threshold
    ]
    metadata.sort(reverse=True)
    return [seed for _, seed in metadata[:max_out_samples]]


def generate_for_prompt(
    prompt: Dict[str, str],
    prompt_dir: str,
    generator: PairGenerator,
    clip_filter: PairClipFilter,
    *,
    n_samples: int = 100,
    max_out_samples: int = 4,
    min_p2p: float = 0.1,
    max_p2p: float = 0.9,
    min_cfg: float = 7.5,
    max_cfg: float = 15.0,
    thresholds: FilterThresholds = FilterThresholds(),
    batch: int = 4,
    rng: Optional[np.random.Generator] = None,
) -> int:
    """Sample/filter/save one prompt's pairs. Returns #pairs kept.

    Idempotent: a prompt_dir that already has metadata.jsonl is skipped
    (the framework's per-item skip-existing contract; the reference would
    blindly regenerate and append)."""
    os.makedirs(prompt_dir, exist_ok=True)
    meta_path = os.path.join(prompt_dir, "metadata.jsonl")
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            return sum(1 for _ in f)
    with open(os.path.join(prompt_dir, "prompt.json"), "w") as f:
        json.dump(prompt, f)

    rng = rng if rng is not None else np.random.default_rng(0)
    results: Dict[int, Dict[str, Any]] = {}
    images: Dict[int, np.ndarray] = {}
    while len(results) < n_samples:
        n = min(batch, n_samples - len(results))
        seeds = []
        while len(seeds) < n:
            s = int(rng.integers(0, 2**31 - 1))
            if s not in results and s not in seeds:
                seeds.append(s)
        thrs = rng.uniform(min_p2p, max_p2p, n).astype(np.float32)
        cfgs = rng.uniform(min_cfg, max_cfg, n).astype(np.float32)
        pairs = generator(prompt["caption"], prompt["output"], seeds, cfgs, thrs)
        sc = clip_filter.scores(pairs, prompt["caption"], prompt["output"])
        for j, s in enumerate(seeds):
            results[s] = {
                "p2p_threshold": float(thrs[j]),
                "cfg_scale": float(cfgs[j]),
                **{k: float(v[j]) for k, v in sc.items()},
            }
            images[s] = pairs[j]

    kept = filter_results(results, thresholds, max_out_samples)
    for seed in kept:
        Image.fromarray(images[seed][0]).save(
            os.path.join(prompt_dir, f"{seed}_0.jpg"), quality=100)
        Image.fromarray(images[seed][1]).save(
            os.path.join(prompt_dir, f"{seed}_1.jpg"), quality=100)
        with open(meta_path, "a") as f:
            f.write(json.dumps(dict(seed=seed, **results[seed])) + "\n")
    if not kept:
        # mark done so a resumed run doesn't regenerate a prompt whose
        # samples all failed the filter
        open(meta_path, "a").close()
    return len(kept)


def prepare_dataset(dataset_dir: str) -> str:
    """Scan prompt dirs -> seeds.json (prepare_dataset.py parity: seeds are
    the name-prefix of every *_0.jpg, entries sorted by dir name)."""
    seeds = []
    for name in sorted(os.listdir(dataset_dir)):
        d = os.path.join(dataset_dir, name)
        if not os.path.isdir(d):
            continue
        prompt_seeds = sorted(
            f.split("_")[0] for f in os.listdir(d) if f.endswith("_0.jpg"))
        if prompt_seeds:
            seeds.append((name, prompt_seeds))
    seeds.sort()
    path = os.path.join(dataset_dir, "seeds.json")
    with open(path, "w") as f:
        json.dump(seeds, f)
    return path


def load_prompts(prompts_file: str) -> List[Dict[str, str]]:
    with open(prompts_file) as f:
        return [json.loads(line) for line in f if line.strip()]


def partition_prompts(prompts: List[Dict[str, str]], n_partitions: int,
                      partition: int) -> List[Tuple[int, Dict[str, str]]]:
    """np.array_split semantics over enumerate(prompts)
    (generate_img_dataset.py:237)."""
    idx = np.array_split(np.arange(len(prompts)), n_partitions)[partition]
    return [(int(i), prompts[int(i)]) for i in idx]
