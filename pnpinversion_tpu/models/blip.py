"""BLIP-base image captioner (ViT-B/16 encoder + BERT-base LM decoder with
cross-attention), functional jnp.

Parity target: the lavis ``blip_caption`` model the pix2pix-zero runner loads
(/root/reference/run_editing_pix2pix_zero.py:28-31) to caption each input
image (the caption becomes both the inversion prompt and the negative
prompt). Decoding matches the reference's beam search (num_beams=3,
max_length=30, min_length=10 — lavis generate defaults routed through HF
``text_decoder.generate``); greedy decode remains available via num_beams=1.

Weights: convert a local BLIP checkpoint (HF blip-image-captioning-base or
lavis base_coco) with convert/blip_to_jax-style mappings; without weights the
captioner emits garbage tokens (pipeline-complete for tests).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pnpinversion_tpu.models import vit
from pnpinversion_tpu.models.layers import init_linear, init_norm, layer_norm, linear

Array = jax.Array
Params = Dict[str, Any]

BLIP_VIT_B16_384 = vit.ViTConfig(image_size=384, patch_size=16, width=768,
                                 layers=12, heads=12, style="dino",
                                 activation="gelu")


@dataclasses.dataclass(frozen=True)
class BlipTextConfig:
    vocab_size: int = 30524
    width: int = 768
    layers: int = 12
    heads: int = 12
    max_len: int = 40
    bos_token_id: int = 30522  # [DEC]
    sep_token_id: int = 102  # [SEP] ends generation
    pad_token_id: int = 0


TINY_BLIP_TEXT = BlipTextConfig(vocab_size=64, width=32, layers=2, heads=2,
                                max_len=8, bos_token_id=1, sep_token_id=2)


def init_blip_decoder_params(key, cfg: BlipTextConfig = BlipTextConfig()) -> Params:
    w = cfg.width
    keys = iter(jax.random.split(key, 16 + 12 * cfg.layers))
    p: Params = {
        "word_embedding": jax.random.normal(next(keys), (cfg.vocab_size, w)) * 0.02,
        "position_embedding": jax.random.normal(next(keys), (512, w)) * 0.02,
        "embed_norm": init_norm(w),
        "layers": [],
        "cls_dense": init_linear(next(keys), w, w),
        "cls_norm": init_norm(w),
        "cls_decoder": init_linear(next(keys), w, cfg.vocab_size),
    }
    for _ in range(cfg.layers):
        p["layers"].append({
            "self_q": init_linear(next(keys), w, w),
            "self_k": init_linear(next(keys), w, w),
            "self_v": init_linear(next(keys), w, w),
            "self_out": init_linear(next(keys), w, w),
            "self_norm": init_norm(w),
            "cross_q": init_linear(next(keys), w, w),
            "cross_k": init_linear(next(keys), w, w),
            "cross_v": init_linear(next(keys), w, w),
            "cross_out": init_linear(next(keys), w, w),
            "cross_norm": init_norm(w),
            "fc1": init_linear(next(keys), w, 4 * w),
            "fc2": init_linear(next(keys), 4 * w, w),
            "out_norm": init_norm(w),
        })
    return p


def _mha(q_p, k_p, v_p, out_p, x_q, x_kv, heads: int, mask: Optional[Array]) -> Array:
    b, sq, w = x_q.shape
    hd = w // heads
    q = linear(q_p, x_q).reshape(b, sq, heads, hd).transpose(0, 2, 1, 3)
    k = linear(k_p, x_kv).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    v = linear(v_p, x_kv).reshape(b, -1, heads, hd).transpose(0, 2, 1, 3)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * hd**-0.5
    if mask is not None:
        s = s + mask
    a = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(x_q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", a, v)
    return linear(out_p, o.transpose(0, 2, 1, 3).reshape(b, sq, w))


def blip_decoder_logits(params: Params, token_ids: Array, image_tokens: Array,
                        cfg: BlipTextConfig) -> Array:
    """token_ids (B, S) int32; image_tokens (B, N, w) -> logits (B, S, vocab).
    BERT post-LN blocks with causal self-attn + cross-attn to the image."""
    b, s = token_ids.shape
    x = params["word_embedding"][token_ids].astype(jnp.float32)
    x = x + params["position_embedding"][:s].astype(jnp.float32)
    x = layer_norm(params["embed_norm"], x)
    causal = jnp.triu(jnp.full((s, s), -jnp.inf, jnp.float32), k=1)

    for lp in params["layers"]:
        a = _mha(lp["self_q"], lp["self_k"], lp["self_v"], lp["self_out"],
                 x, x, cfg.heads, causal)
        x = layer_norm(lp["self_norm"], x + a)
        c = _mha(lp["cross_q"], lp["cross_k"], lp["cross_v"], lp["cross_out"],
                 x, image_tokens.astype(x.dtype), cfg.heads, None)
        x = layer_norm(lp["cross_norm"], x + c)
        h = linear(lp["fc2"], jax.nn.gelu(linear(lp["fc1"], x), approximate=False))
        x = layer_norm(lp["out_norm"], x + h)

    h = jax.nn.gelu(linear(params["cls_dense"], x), approximate=False)
    h = layer_norm(params["cls_norm"], h)
    return linear(params["cls_decoder"], h)


def greedy_caption_ids(params: Params, image_tokens: Array,
                       cfg: BlipTextConfig,
                       prompt_ids: Optional[List[int]] = None) -> Array:
    """Greedy decode. Returns (max_len,) int32 token ids (pad after [SEP])."""
    prompt_ids = prompt_ids or []
    L = cfg.max_len
    init = jnp.full((1, L), cfg.pad_token_id, jnp.int32)
    init = init.at[0, 0].set(cfg.bos_token_id)
    for i, t in enumerate(prompt_ids):
        init = init.at[0, i + 1].set(t)
    start = 1 + len(prompt_ids)

    def body(carry, pos):
        ids, done = carry
        logits = blip_decoder_logits(params, ids, image_tokens, cfg)
        nxt = jnp.argmax(logits[0, pos - 1], axis=-1).astype(jnp.int32)
        write = (pos >= start) & (~done)
        ids = ids.at[0, pos].set(jnp.where(write, nxt, ids[0, pos]))
        done = done | (write & (nxt == cfg.sep_token_id))
        return (ids, done), ()

    (ids, _), _ = jax.lax.scan(body, (init, jnp.bool_(False)), jnp.arange(1, L))
    return ids[0]


def beam_caption_ids(params: Params, image_tokens: Array,
                     cfg: BlipTextConfig,
                     prompt_ids: Optional[List[int]] = None,
                     num_beams: int = 3,
                     min_length: int = 10,
                     length_penalty: float = 1.0) -> Array:
    """Beam-search decode (static beam count inside a scan), HF
    ``generate(num_beams=...)`` semantics: per-step top-2K candidate pool,
    EOS candidates finalize a hypothesis only when ranked < K, scores are
    sum-logprob divided by sequence-length**length_penalty, and search stops
    (freezes) once K hypotheses are finished and the best possible live score
    cannot beat the worst finished one (early_stopping=False rule).

    Matches the lavis blip_caption decode the reference runner uses
    (/root/reference/run_editing_pix2pix_zero.py:79 -> lavis generate with
    num_beams=3, max_length=30, min_length=10 via HF ``text_decoder.generate``).

    Returns (max_len,) int32 ids of the best hypothesis (pad-filled tail; no
    trailing SEP — the caller stops at SEP or PAD anyway).
    """
    prompt_ids = prompt_ids or []
    K = num_beams
    L = cfg.max_len
    V = cfg.vocab_size
    eos = cfg.sep_token_id
    NEG = jnp.float32(-1e9)

    init_ids = jnp.full((K, L), cfg.pad_token_id, jnp.int32)
    init_ids = init_ids.at[:, 0].set(cfg.bos_token_id)
    for i, t in enumerate(prompt_ids):
        init_ids = init_ids.at[:, i + 1].set(t)
    start = 1 + len(prompt_ids)

    img = jnp.broadcast_to(image_tokens, (K,) + image_tokens.shape[1:])
    # only beam 0 is live at step one (all beams start identical)
    init_scores = jnp.full((K,), NEG).at[0].set(0.0)

    def body(carry, pos):
        ids, scores, fin_ids, fin_scores, done = carry
        logits = blip_decoder_logits(params, ids, img, cfg)[:, pos - 1]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # MinLengthLogitsProcessor: suppress EOS while cur_len < min_length
        logp = jnp.where((pos < min_length) & (jnp.arange(V) == eos)[None, :],
                         NEG, logp)
        cand = (scores[:, None] + logp).reshape(-1)  # (K*V,)
        top_val, top_idx = jax.lax.top_k(cand, 2 * K)
        top_src = top_idx // V
        top_tok = (top_idx % V).astype(jnp.int32)
        is_eos = top_tok == eos

        # finished-hypothesis pool: EOS candidates ranked < K enter, replacing
        # the worst if better. Scores normalize by the GENERATED length
        # including the EOS (transformers >= 4.26: generated_len =
        # cur_len + 1 - decoder_prompt_len in BeamSearchScorer.process).
        hyp_len = (pos + 1 - start).astype(jnp.float32)
        for r in range(K):
            hscore = top_val[r] / hyp_len**length_penalty
            worst = jnp.argmin(fin_scores)
            take = is_eos[r] & (hscore > fin_scores[worst]) & (~done)
            fin_scores = fin_scores.at[worst].set(
                jnp.where(take, hscore, fin_scores[worst]))
            fin_ids = fin_ids.at[worst].set(
                jnp.where(take, ids[top_src[r]], fin_ids[worst]))

        # next beams: the first K non-EOS candidates in rank order
        noneos_rank = jnp.cumsum(~is_eos) - 1
        keep = (~is_eos) & (noneos_rank < K)
        slot = jnp.where(keep, noneos_rank, K)  # K = dump slot
        new_scores = jnp.full((K + 1,), NEG).at[slot].set(
            jnp.where(keep, top_val, NEG))[:K]
        new_src = jnp.zeros((K + 1,), jnp.int32).at[slot].set(
            jnp.where(keep, top_src, 0))[:K]
        new_tok = jnp.zeros((K + 1,), jnp.int32).at[slot].set(
            jnp.where(keep, top_tok, 0))[:K]
        new_ids = ids[new_src].at[:, pos].set(new_tok)

        # is_done (early_stopping=False): all K finished and the worst
        # finished score beats the best possible live candidate at this length
        pool_full = jnp.min(fin_scores) > NEG / 2
        cannot_improve = jnp.min(fin_scores) >= top_val[0] / hyp_len**length_penalty
        done_new = done | (pool_full & cannot_improve)

        ids = jnp.where(done, ids, new_ids)
        scores = jnp.where(done, scores, new_scores)
        return (ids, scores, fin_ids, fin_scores, done_new), ()

    fin_ids0 = jnp.full((K, L), cfg.pad_token_id, jnp.int32)
    fin_scores0 = jnp.full((K,), NEG)
    (ids, scores, fin_ids, fin_scores, done), _ = jax.lax.scan(
        body, (init_ids, init_scores, fin_ids0, fin_scores0, jnp.bool_(False)),
        jnp.arange(start, L))

    # finalize: unfinished beams enter the pool at full generated length
    final_scores = scores / jnp.float32(L - start) ** length_penalty
    for r in range(K):
        worst = jnp.argmin(fin_scores)
        take = (~done) & (final_scores[r] > fin_scores[worst])
        fin_scores = fin_scores.at[worst].set(
            jnp.where(take, final_scores[r], fin_scores[worst]))
        fin_ids = fin_ids.at[worst].set(jnp.where(take, ids[r], fin_ids[worst]))

    return fin_ids[jnp.argmax(fin_scores)]


class BlipCaptioner:
    """Callable captioner: uint8 image -> str. Prompt "a picture of "."""

    def __init__(self, vision_params, decoder_params, tokenizer,
                 vision_cfg: vit.ViTConfig = BLIP_VIT_B16_384,
                 text_cfg: BlipTextConfig = BlipTextConfig(),
                 prompt: str = "a picture of ",
                 num_beams: int = 3, min_length: int = 10):
        self.vision_params = vision_params
        self.decoder_params = decoder_params
        self.tokenizer = tokenizer
        self.vision_cfg = vision_cfg
        self.text_cfg = text_cfg
        self.prompt = prompt
        self.num_beams = num_beams
        self.min_length = min_length
        self._jit = None

    @classmethod
    def random_init(cls, rng, tokenizer, vision_cfg=BLIP_VIT_B16_384,
                    text_cfg: BlipTextConfig = BlipTextConfig(), prompt="a picture of "):
        k1, k2 = jax.random.split(rng)
        return cls(vit.init_vit_params(k1, vision_cfg),
                   init_blip_decoder_params(k2, text_cfg),
                   tokenizer, vision_cfg, text_cfg, prompt)

    def _caption_fn(self):
        from pnpinversion_tpu.evaluation.metrics import (
            center_crop_resize_224,
            imagenet_normalize,
        )

        if self._jit is None:
            prompt_ids = [t for t in self.tokenizer.encode(self.prompt)
                          if t not in (getattr(self.tokenizer, "bos_token_id", -1),
                                       getattr(self.tokenizer, "eos_token_id", -1))]

            def fn(vp, dp, img):
                x = img.astype(jnp.float32) / 255.0
                x = center_crop_resize_224(x, self.vision_cfg.image_size)
                x = imagenet_normalize(x)
                tokens, _ = vit.vit_apply(vp, x[None], self.vision_cfg,
                                          return_tokens=True)
                if self.num_beams <= 1:
                    return greedy_caption_ids(dp, tokens, self.text_cfg,
                                              prompt_ids)
                return beam_caption_ids(dp, tokens, self.text_cfg, prompt_ids,
                                        num_beams=self.num_beams,
                                        min_length=self.min_length)

            # batched: the whole decode (incl. beam search) vmaps over images
            self._jit = jax.jit(jax.vmap(fn, in_axes=(None, None, 0)))
        return self._jit

    def _decode_ids(self, ids: np.ndarray) -> str:
        out: List[int] = []
        for t in ids[1:]:
            if t in (self.text_cfg.sep_token_id, self.text_cfg.pad_token_id):
                break
            out.append(int(t))
        return self.tokenizer.decode(out).strip()

    def __call__(self, image_u8: np.ndarray) -> str:
        return self.caption_batch(np.asarray(image_u8)[None])[0]

    def caption_batch(self, images_u8: np.ndarray) -> List[str]:
        """Caption (N,H,W,3) images in ONE device dispatch (the per-image
        path pays a tunnel round trip per call)."""
        ids = np.asarray(self._caption_fn()(
            self.vision_params, self.decoder_params,
            jnp.asarray(np.asarray(images_u8))))
        return [self._decode_ids(row) for row in ids]


def make_blip_captioner(checkpoint_dir: str) -> BlipCaptioner:
    """Load converted BLIP weights from checkpoint_dir/pnpi_tpu_params/blip_*."""
    import os

    from pnpinversion_tpu.convert.checkpoint import CACHE_SUBDIR, _orbax_load
    from pnpinversion_tpu.utils.tokenizer import default_tokenizer

    vp_dir = os.path.join(checkpoint_dir, CACHE_SUBDIR, "blip_vision")
    dp_dir = os.path.join(checkpoint_dir, CACHE_SUBDIR, "blip_decoder")
    if not (os.path.isdir(vp_dir) and os.path.isdir(dp_dir)):
        raise FileNotFoundError("no converted BLIP weights found")
    tok = default_tokenizer(os.path.join(checkpoint_dir, "blip_tokenizer"))
    return BlipCaptioner(_orbax_load(vp_dir), _orbax_load(dp_dir), tok)
