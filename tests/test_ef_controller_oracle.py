"""EF-DDPM's own P2P controller stack (LOW_RESOURCE variant) as a torch
oracle: our cond-half editing must match its cond-call editing."""
import os
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from pnpinversion_tpu.configs import SD14_UNET
from pnpinversion_tpu.control.p2p import make_p2p_control
from pnpinversion_tpu.models.unet import enumerate_sites
from pnpinversion_tpu.utils.tokenizer import SimpleWordTokenizer

REF = "/root/reference"
HAVE_REF = os.path.isdir(REF)


@pytest.mark.skipif(not HAVE_REF, reason="reference repo not mounted")
def test_ef_refine_controller_matches():
    import torch

    sys.path.insert(0, REF)
    try:
        from models.edit_friendly_ddm.ptp_classes import AttentionRefine
    finally:
        sys.path.remove(REF)

    tok = SimpleWordTokenizer()
    prompts = ["a cat on a mat", "a fluffy cat on a mat"]

    class MockModel:
        tokenizer = tok
        device = "cpu"

    ref = AttentionRefine(prompts, 50, cross_replace_steps=0.4,
                          self_replace_steps=0.6, model=MockModel())
    ours, tensors = make_p2p_control(
        prompts, tok, num_steps=50, cross_replace_steps=0.4,
        self_replace_steps=0.6, is_replace_controller=False,
        num_lb_slots=5, lb_res=16, latent_size=64,
        self_edit_max_seq=16 * 16)

    # LOW_RESOURCE=True: the controller edits the batch-B cond call directly;
    # replicate by feeding the cond half and matching our probs_hook output
    sites = [s for pair in enumerate_sites(SD14_UNET) for s in pair
             if s.is_cross or s.seq_len <= 32**2]
    fed = sites[:8]
    H, B = 2, 2
    ref.num_att_layers = len(fed)
    # skip the uncond phase (LOW_RESOURCE counts it first)
    ref.cur_att_layer = ref.num_uncond_att_layers
    rng = np.random.RandomState(0)
    state = {}
    for step in range(2):
        for site in fed:
            sq = site.seq_len
            sk = 77 if site.is_cross else sq
            cond = rng.rand(B, H, sq, sk).astype(np.float32)
            cond /= cond.sum(-1, keepdims=True)
            ref_in = torch.from_numpy(cond.reshape(B * H, sq, sk).copy())
            ref_out = ref(ref_in, site.is_cross, site.place)
            ref_out = ref_out.numpy().reshape(B, H, sq, sk)

            # our layout prepends an untouched uncond half
            full = np.concatenate([cond, cond], axis=0)
            site_h = type(site)(**{**site.__dict__, "heads": H})
            out, state = ours.probs_hook(site_h, jnp.asarray(full), tensors,
                                         state, jnp.int32(step))
            np.testing.assert_allclose(np.asarray(out)[B:], ref_out, atol=1e-5,
                                       err_msg=f"step={step} site={site}")
        # wrap the oracle's step like its between_steps would
        ref.cur_att_layer = ref.num_uncond_att_layers
        ref.cur_step = step + 1
