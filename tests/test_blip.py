"""BLIP captioner: decoder math and end-to-end greedy decode on tiny configs."""
import jax
import jax.numpy as jnp
import numpy as np

from pnpinversion_tpu.models import vit
from pnpinversion_tpu.models.blip import (
    TINY_BLIP_TEXT,
    BlipCaptioner,
    blip_decoder_logits,
    init_blip_decoder_params,
)


class TinyIdTokenizer:
    """ids 3.. map to w<id>; protocol-compatible."""

    bos_token_id = 1
    eos_token_id = 2
    model_max_length = 16

    def encode(self, text):
        return [self.bos_token_id] + [3 + (hash(w) % 60) for w in text.split()] + [
            self.eos_token_id]

    def decode(self, ids):
        return " ".join(f"w{int(i)}" for i in ids)


def test_decoder_causality():
    cfg = TINY_BLIP_TEXT
    params = init_blip_decoder_params(jax.random.PRNGKey(0), cfg)
    img = jax.random.normal(jax.random.PRNGKey(1), (1, 5, cfg.width))
    ids = jnp.array([[1, 5, 6, 7, 0, 0, 0, 0]], jnp.int32)
    logits = blip_decoder_logits(params, ids, img, cfg)
    assert logits.shape == (1, 8, cfg.vocab_size)
    # changing a later token must not change earlier logits
    ids2 = ids.at[0, 3].set(9)
    logits2 = blip_decoder_logits(params, ids2, img, cfg)
    np.testing.assert_allclose(np.asarray(logits[0, :3]),
                               np.asarray(logits2[0, :3]), atol=1e-4)
    assert not np.allclose(np.asarray(logits[0, 3]), np.asarray(logits2[0, 3]))


def test_captioner_end_to_end():
    vision_cfg = vit.ViTConfig(image_size=16, patch_size=8, width=32, layers=1,
                               heads=2, style="dino", activation="gelu")
    cap = BlipCaptioner.random_init(jax.random.PRNGKey(0), TinyIdTokenizer(),
                                    vision_cfg=vision_cfg, text_cfg=TINY_BLIP_TEXT,
                                    prompt="w3")
    img = (np.random.RandomState(0).rand(16, 16, 3) * 255).astype(np.uint8)
    caption = cap(img)
    assert isinstance(caption, str)
    # deterministic
    assert cap(img) == caption


def test_beam_search_matches_transformers_generate():
    """beam_caption_ids vs HF generate(num_beams=3) on a tiny converted
    decoder — the reference captions via lavis -> HF beam search
    (/root/reference/run_editing_pix2pix_zero.py:79)."""
    import torch
    from transformers import BlipTextConfig as HFBlipTextConfig
    from transformers.models.blip.modeling_blip_text import BlipTextLMHeadModel

    from pnpinversion_tpu.convert.metric_models import convert_blip_decoder
    from pnpinversion_tpu.models.blip import BlipTextConfig, beam_caption_ids

    hf_cfg = HFBlipTextConfig(vocab_size=64, hidden_size=32,
                              intermediate_size=128, num_hidden_layers=2,
                              num_attention_heads=2, encoder_hidden_size=32,
                              is_decoder=True)
    torch.manual_seed(3)
    model = BlipTextLMHeadModel(hf_cfg).eval()
    params = jax.tree.map(jnp.asarray, convert_blip_decoder(
        {k: v.numpy() for k, v in model.state_dict().items()}, layers=2))
    cfg = BlipTextConfig(vocab_size=64, width=32, layers=2, heads=2,
                         max_len=12, bos_token_id=1, sep_token_id=2,
                         pad_token_id=0)

    for seed, prompt_ids in [(0, [5, 6]), (1, [7]), (2, [5, 6])]:
        img_tokens = np.random.RandomState(seed).randn(1, 5, 32).astype(np.float32)
        input_ids = torch.tensor([[cfg.bos_token_id] + prompt_ids])
        with torch.no_grad():
            ref = model.generate(
                input_ids=input_ids,
                encoder_hidden_states=torch.from_numpy(img_tokens),
                num_beams=3, max_length=cfg.max_len, min_length=5,
                do_sample=False, length_penalty=1.0, early_stopping=False,
                eos_token_id=cfg.sep_token_id, pad_token_id=cfg.pad_token_id,
            )[0].numpy()
        ours = np.asarray(beam_caption_ids(
            params, jnp.asarray(img_tokens), cfg, prompt_ids,
            num_beams=3, min_length=5))
        # ours stores the hypothesis without the trailing EOS; HF appends it
        ours_toks = [int(t) for t in ours[1:]
                     if t not in (cfg.sep_token_id, cfg.pad_token_id)]
        ref_toks = [int(t) for t in ref[1:]
                    if t not in (cfg.sep_token_id, cfg.pad_token_id)]
        assert ours_toks == ref_toks, (seed, ours_toks, ref_toks)


def test_captioner_beam_end_to_end():
    vision_cfg = vit.ViTConfig(image_size=16, patch_size=8, width=32, layers=1,
                               heads=2, style="dino", activation="gelu")
    cap = BlipCaptioner.random_init(jax.random.PRNGKey(1), TinyIdTokenizer(),
                                    vision_cfg=vision_cfg, text_cfg=TINY_BLIP_TEXT,
                                    prompt="w3")
    cap.num_beams, cap.min_length = 3, 2
    img = (np.random.RandomState(1).rand(16, 16, 3) * 255).astype(np.uint8)
    caption = cap(img)
    assert isinstance(caption, str)
    assert cap(img) == caption


def test_wordpiece_tokenizer(tmp_path):
    from pnpinversion_tpu.utils.tokenizer import BertWordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "cat", "##s", "on", "mat"]
    vf = tmp_path / "vocab.txt"
    vf.write_text("\n".join(vocab) + "\n")
    tok = BertWordPieceTokenizer(str(vf))
    ids = tok.encode("a cats on a mat")
    assert ids[0] == tok.cls_token_id and ids[-1] == tok.sep_token_id
    assert tok.decode(ids) == "a cats on a mat"
    assert tok.vocab["##s"] in ids
    # unknown word -> UNK
    assert tok.unk_token_id in tok.encode("zzz")
