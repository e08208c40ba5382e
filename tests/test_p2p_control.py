"""P2P controller semantics, verified against the reference controller stack
(run as a torch-CPU oracle on identical random attention maps)."""
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import SD14_UNET
from pnpinversion_tpu.control.p2p import P2PControl, make_p2p_control
from pnpinversion_tpu.models.unet import enumerate_sites
from pnpinversion_tpu.utils.tokenizer import SimpleWordTokenizer

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)

HEADS = 2  # keep the oracle cheap; head count is semantically irrelevant
PROMPTS = ["a cat on a mat", "a silver cat sculpture on a mat"]
BLEND = (("cat",), ("cat", "sculpture"))
EQ = {"words": ("sculpture",), "values": (2.0,)}


def _oracle_controller(tok, is_replace, blend, eq, num_steps=50):
    sys.path.insert(0, REF)
    try:
        # make_controller hardcodes device="cuda" for the edit controllers, so
        # wire the same stack manually on CPU (attention_control.py:366-405)
        from models.p2p.attention_control import (
            AttentionRefine,
            AttentionReplace,
            AttentionReweight,
            LocalBlend,
            get_equalizer,
        )

        src, tgt = PROMPTS
        prompts = [src, tgt] if not is_replace else ["a cat on a mat", "a dog on a mat"]
        lb = None
        if blend is not None:
            lb = LocalBlend(prompts, blend, tokenizer=tok, device="cpu",
                            num_ddim_steps=num_steps)
        cls = AttentionReplace if is_replace else AttentionRefine
        ctrl = cls(prompts, num_steps, cross_replace_steps={"default_": 0.4},
                   self_replace_steps=0.6, local_blend=lb, tokenizer=tok,
                   device="cpu")
        if eq is not None:
            eq_t = get_equalizer(prompts[1], eq["words"], eq["values"], tokenizer=tok)
            ctrl = AttentionReweight(prompts, num_steps,
                                     cross_replace_steps={"default_": 0.4},
                                     self_replace_steps=0.6, equalizer=eq_t,
                                     local_blend=lb, controller=ctrl, device="cpu")
        return ctrl, prompts
    finally:
        sys.path.remove(REF)


def _our_control(tok, prompts, is_replace, blend, eq, num_steps=50):
    ctrl, tensors = make_p2p_control(
        prompts, tok, num_steps=num_steps,
        cross_replace_steps=0.4, self_replace_steps=0.6,
        is_replace_controller=is_replace, blend_words=blend, eq_params=eq,
        num_lb_slots=5, lb_res=16, latent_size=64,
    )
    return ctrl, tensors


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
@pytest.mark.parametrize("is_replace", [False, True])
@pytest.mark.parametrize("with_blend", [False, True])
def test_probs_edit_matches_reference(is_replace, with_blend):
    import torch

    tok = SimpleWordTokenizer()
    blend = BLEND if with_blend else None
    eq = EQ if with_blend else None
    # short schedule so LocalBlend's start_blend (0.2*T) activates within 3 steps
    num_steps = 5 if with_blend else 50
    ref_ctrl, prompts = _oracle_controller(tok, is_replace, blend, eq, num_steps)
    our_ctrl, tensors = _our_control(tok, prompts, is_replace, blend, eq, num_steps)

    B = 2
    rng = np.random.RandomState(0)
    # the ≤32² sites of SD1.4 in execution order (self, cross per block)
    sites = enumerate_sites(SD14_UNET)
    fed = []
    for self_site, cross_site in sites:
        if self_site.seq_len <= 32**2:
            fed.append(self_site)
        fed.append(cross_site)
    ref_ctrl.num_att_layers = len(fed)

    state = our_ctrl.init_state(B, heads=HEADS)
    num_checked = 0
    for step in range(3):
        for site in fed:
            sq = site.seq_len
            sk = 77 if site.is_cross else sq
            probs = rng.rand(2 * B, HEADS, sq, sk).astype(np.float32)
            probs /= probs.sum(-1, keepdims=True)

            # reference: (2B*H, sq, sk), edits in place on the cond half
            ref_in = torch.from_numpy(probs.reshape(2 * B * HEADS, sq, sk).copy())
            ref_out = ref_ctrl(ref_in, site.is_cross, site.place)
            ref_out = ref_out.numpy().reshape(2 * B, HEADS, sq, sk)

            site_h = type(site)(**{**site.__dict__, "heads": HEADS})
            ours, state = our_ctrl.probs_hook(
                site_h, jnp.asarray(probs), tensors, state, jnp.int32(step)
            )
            np.testing.assert_allclose(
                np.asarray(ours), ref_out, atol=1e-5,
                err_msg=f"step={step} site={site}")
            num_checked += 1

        # LocalBlend step callback on the latents
        if with_blend:
            x_t = rng.randn(B, 64, 64, 4).astype(np.float32)
            ref_x = torch.from_numpy(x_t.transpose(0, 3, 1, 2).copy())
            ref_x = ref_ctrl.step_callback(ref_x).numpy().transpose(0, 2, 3, 1)
            ours_x, state = our_ctrl.step_callback(
                jnp.asarray(x_t), tensors, state, jnp.int32(step)
            )
            np.testing.assert_allclose(np.asarray(ours_x), ref_x, atol=1e-5,
                                       err_msg=f"local blend step={step}")
        else:
            ref_ctrl.cur_step += 0  # reference advances cur_step inside __call__
    assert num_checked == len(fed) * 3


def test_self_replace_window():
    tok = SimpleWordTokenizer()
    ctrl, tensors = _our_control(tok, PROMPTS, False, None, None, num_steps=50)
    site = [s for pair in enumerate_sites(SD14_UNET) for s in pair
            if not s.is_cross and s.seq_len <= 32**2][0]
    site = type(site)(**{**site.__dict__, "heads": HEADS})
    probs = jnp.asarray(np.random.rand(4, HEADS, site.seq_len, site.seq_len).astype(np.float32))
    state = {}
    # inside window (step 0 < 30): cond target row equals cond base row
    out, _ = ctrl.probs_hook(site, probs, tensors, state, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(out[2]), atol=1e-6)
    # outside window (step 40): untouched
    out, _ = ctrl.probs_hook(site, probs, tensors, state, jnp.int32(40))
    np.testing.assert_allclose(np.asarray(out), np.asarray(probs), atol=1e-6)


def test_attention_override_matches_probs_path():
    """The memory-light self-attn override must equal the probs-path edit."""
    tok = SimpleWordTokenizer()
    ctrl, tensors = _our_control(tok, PROMPTS, False, None, None, num_steps=50)
    site = [s for pair in enumerate_sites(SD14_UNET) for s in pair
            if not s.is_cross and s.seq_len <= 32**2][0]
    site = type(site)(**{**site.__dict__, "heads": HEADS})
    rng = np.random.RandomState(7)
    S, D = site.seq_len, 8
    q = jnp.asarray(rng.randn(4, HEADS, S, D).astype(np.float32))
    k = jnp.asarray(rng.randn(4, HEADS, S, D).astype(np.float32))
    v = jnp.asarray(rng.randn(4, HEADS, S, D).astype(np.float32))
    scale = D**-0.5
    for step in (0, 40):  # in / out of the self-replace window
        from pnpinversion_tpu.ops.attention import apply_probs, attention_probs

        probs = attention_probs(q, k, scale)
        probs_edit, _ = ctrl.probs_hook(site, probs, tensors, {}, jnp.int32(step))
        ref = apply_probs(probs_edit, v)
        out, _ = ctrl.attention_override(site, q, k, v, scale, tensors, {},
                                         jnp.int32(step))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_uncond_half_untouched():
    tok = SimpleWordTokenizer()
    ctrl, tensors = _our_control(tok, PROMPTS, False, None, None)
    site = [s for pair in enumerate_sites(SD14_UNET) for s in pair if s.is_cross][0]
    site = type(site)(**{**site.__dict__, "heads": HEADS})
    probs = jnp.asarray(np.random.rand(4, HEADS, site.seq_len, 77).astype(np.float32))
    out, _ = ctrl.probs_hook(site, probs, tensors, {}, jnp.int32(0))
    np.testing.assert_array_equal(np.asarray(out[:2]), np.asarray(probs[:2]))
