"""Metric-model converters vs transformers oracles (tiny configs)."""
import numpy as np
import pytest

import jax.numpy as jnp

from pnpinversion_tpu.convert.metric_models import (
    convert_blip_decoder,
    convert_clip_vision,
    convert_dino_vit,
)
from pnpinversion_tpu.models import vit


def test_clip_vision_matches_transformers():
    import torch
    from transformers import CLIPVisionConfig, CLIPVisionModelWithProjection

    hf_cfg = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                              num_hidden_layers=2, num_attention_heads=2,
                              image_size=32, patch_size=8, projection_dim=16,
                              hidden_act="quick_gelu")
    torch.manual_seed(0)
    model = CLIPVisionModelWithProjection(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_clip_vision(sd, layers=2)

    cfg = vit.ViTConfig(image_size=32, patch_size=8, width=32, layers=2,
                        heads=2, style="clip", projection_dim=16,
                        activation="quick_gelu")
    img = np.random.RandomState(0).randn(1, 3, 32, 32).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(img)).image_embeds.numpy()
    ours, _ = vit.vit_apply(params, jnp.asarray(img.transpose(0, 2, 3, 1)), cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=3e-4)


def test_blip_decoder_matches_transformers():
    import torch
    from transformers import BlipTextConfig as HFBlipTextConfig
    from transformers.models.blip.modeling_blip_text import BlipTextLMHeadModel

    hf_cfg = HFBlipTextConfig(vocab_size=64, hidden_size=32,
                              intermediate_size=128, num_hidden_layers=2,
                              num_attention_heads=2, encoder_hidden_size=32,
                              is_decoder=True)
    torch.manual_seed(0)
    model = BlipTextLMHeadModel(hf_cfg).eval()
    sd = {k: v.numpy() for k, v in model.state_dict().items()}
    params = convert_blip_decoder(sd, layers=2)

    from pnpinversion_tpu.models.blip import BlipTextConfig, blip_decoder_logits

    cfg = BlipTextConfig(vocab_size=64, width=32, layers=2, heads=2)
    ids = np.array([[1, 5, 6, 7]], dtype=np.int64)
    img_tokens = np.random.RandomState(1).randn(1, 5, 32).astype(np.float32)
    with torch.no_grad():
        ref = model(torch.from_numpy(ids),
                    encoder_hidden_states=torch.from_numpy(img_tokens),
                    ).logits.numpy()
    ours = np.asarray(blip_decoder_logits(
        params, jnp.asarray(ids, jnp.int32), jnp.asarray(img_tokens), cfg))
    np.testing.assert_allclose(ours, ref, atol=3e-4)


def test_dino_converter_shapes():
    """No offline DINO oracle; check the fused-qkv/naming mapping on a
    synthetic state dict shaped like torch.hub's vit_base patch 8."""
    w, layers = 24, 2
    rng = np.random.RandomState(0)
    sd = {
        "cls_token": rng.randn(1, 1, w).astype(np.float32),
        "pos_embed": rng.randn(1, 17, w).astype(np.float32),
        "patch_embed.proj.weight": rng.randn(w, 3, 8, 8).astype(np.float32),
        "patch_embed.proj.bias": rng.randn(w).astype(np.float32),
        "norm.weight": np.ones(w, np.float32),
        "norm.bias": np.zeros(w, np.float32),
    }
    for i in range(layers):
        b = f"blocks.{i}"
        sd[f"{b}.norm1.weight"] = np.ones(w, np.float32)
        sd[f"{b}.norm1.bias"] = np.zeros(w, np.float32)
        sd[f"{b}.attn.qkv.weight"] = rng.randn(3 * w, w).astype(np.float32)
        sd[f"{b}.attn.qkv.bias"] = rng.randn(3 * w).astype(np.float32)
        sd[f"{b}.attn.proj.weight"] = rng.randn(w, w).astype(np.float32)
        sd[f"{b}.attn.proj.bias"] = rng.randn(w).astype(np.float32)
        sd[f"{b}.norm2.weight"] = np.ones(w, np.float32)
        sd[f"{b}.norm2.bias"] = np.zeros(w, np.float32)
        sd[f"{b}.mlp.fc1.weight"] = rng.randn(4 * w, w).astype(np.float32)
        sd[f"{b}.mlp.fc1.bias"] = rng.randn(4 * w).astype(np.float32)
        sd[f"{b}.mlp.fc2.weight"] = rng.randn(w, 4 * w).astype(np.float32)
        sd[f"{b}.mlp.fc2.bias"] = rng.randn(w).astype(np.float32)
    params = convert_dino_vit(sd, layers=layers)
    cfg = vit.ViTConfig(image_size=32, patch_size=8, width=w, layers=layers,
                        heads=2, style="dino", activation="gelu")
    img = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
    pooled, qkvs = vit.vit_apply(params, img, cfg, return_qkv=True)
    assert pooled.shape == (1, w)
    assert len(qkvs) == layers and qkvs[0].shape == (1, 17, 3 * w)
