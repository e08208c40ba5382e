"""CLIPScore end-to-end oracle vs transformers (r1 VERDICT missing #5).

The reference's CLIP similarity backend is torchmetrics
``CLIPScore("openai/clip-vit-large-patch14")``
(/root/reference/evaluation/matrics_calculator.py:274,393-405), which is
``100 * max(cos(get_image_features, get_text_features), 0)`` over a
transformers CLIPModel with CLIPImageProcessor preprocessing. torchmetrics is
not installable here (zero egress), so the oracle is the same formula
executed on a transformers CLIPModel directly:

- preprocessing parity vs CLIPImageProcessor (resize-shortest-side semantics
  incl. the int() truncation of the long side, center crop, normalize);
- tiny random-weights CLIPModel through our converters -> our calculator's
  cosine formula must match torch's to float tolerance.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pnpinversion_tpu.evaluation import metrics as M


def test_clip_preprocess_matches_transformers_processor():
    from transformers import CLIPImageProcessor

    rng = np.random.RandomState(0)
    proc = CLIPImageProcessor(size=224, crop_size=224)
    for shape in [(512, 512, 3), (480, 640, 3), (640, 480, 3)]:
        img = (rng.rand(*shape) * 255).astype(np.uint8)
        ref = proc(images=img, return_tensors="np")["pixel_values"][0]
        ref = ref.transpose(1, 2, 0)
        ours = np.asarray(M.clip_normalize(
            M.center_crop_resize_224(jnp.asarray(img.astype(np.float32) / 255.0))))
        d = np.abs(ref - ours)
        # residual is the PIL-vs-jax bicubic kernel difference only (random
        # noise images are the resampler's worst case); any crop misalignment
        # shows up as mean ~0.25
        assert d.mean() < 0.01, (shape, d.mean())
        assert d.max() < 0.12, (shape, d.max())


class _FixedIdsTokenizer:
    """Returns pre-set ids; exposes eos_token_id like the BPE tokenizer."""

    def __init__(self, ids, eos_token_id):
        self._ids = ids
        self.eos_token_id = eos_token_id

    def __call__(self, texts, max_length=77):
        ids = np.zeros((len(texts), max_length), np.int32)
        ids[:, : len(self._ids)] = self._ids
        return {"input_ids": ids}


def test_clipscore_end_to_end_matches_transformers():
    import torch
    from transformers import CLIPConfig, CLIPModel, CLIPTextConfig as HFTextConfig
    from transformers import CLIPVisionConfig as HFVisionConfig

    from pnpinversion_tpu.configs import CLIPTextConfig
    from pnpinversion_tpu.convert.metric_models import convert_clip_vision
    from pnpinversion_tpu.convert.torch_to_jax import convert_clip_text
    from pnpinversion_tpu.evaluation.calculator import MetricsCalculator
    from pnpinversion_tpu.models import vit

    eos = 3
    hf_cfg = CLIPConfig.from_text_vision_configs(
        HFTextConfig(vocab_size=128, hidden_size=32, intermediate_size=128,
                     num_hidden_layers=2, num_attention_heads=2,
                     max_position_embeddings=77, hidden_act="quick_gelu",
                     eos_token_id=eos, bos_token_id=2, pad_token_id=0),
        HFVisionConfig(hidden_size=32, intermediate_size=64,
                       num_hidden_layers=2, num_attention_heads=2,
                       image_size=32, patch_size=8, hidden_act="quick_gelu"),
        projection_dim=16)
    torch.manual_seed(0)
    model = CLIPModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}

    # ids with an explicit first-EOS not at argmax (vocab id 100 later) so the
    # test distinguishes first-EOS pooling from HF's argmax shortcut
    ids = np.array([2, 7, 100, eos, eos], np.int32)
    calc = MetricsCalculator(tiny=True, tokenizer=_FixedIdsTokenizer(ids, eos))
    vis_sd = {k[len("vision_model."):]: v for k, v in sd.items()
              if k.startswith("vision_model.")}
    vis_sd["visual_projection.weight"] = sd["visual_projection.weight"]
    calc.params["clip_vision"] = convert_clip_vision(vis_sd, layers=2)
    txt_sd = {k[len("text_model."):]: v for k, v in sd.items()
              if k.startswith("text_model.")}
    calc.params["clip_text"] = convert_clip_text(
        txt_sd, CLIPTextConfig(vocab_size=128, width=32, layers=2, heads=2))
    calc.params["clip_text_proj"] = {
        "kernel": np.ascontiguousarray(sd["text_projection.weight"].T)}

    # image at the tiny tower's native 32px so preprocessing is identity and
    # the comparison isolates model+formula parity
    rng = np.random.RandomState(1)
    img = (rng.rand(32, 32, 3) * 255).astype(np.uint8)

    with torch.no_grad():
        px = np.asarray(M.clip_normalize(jnp.asarray(img, jnp.float32) / 255.0))
        ie = model.get_image_features(
            torch.from_numpy(px.transpose(2, 0, 1)[None]))
        ids_t = torch.from_numpy(np.pad(ids, (0, 72))[None].astype(np.int64))
        te = model.get_text_features(ids_t)
        cos = torch.nn.functional.cosine_similarity(ie, te)
        ref = float((100 * cos).clamp(min=0))

    ours = calc.calculate_clip_similarity(img, "ignored — ids are fixed")
    assert ours == pytest.approx(ref, abs=5e-3)
