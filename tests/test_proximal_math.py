"""Proximal-guidance shrink/mask math vs a direct torch transcription of the
reference (proximal_guidance_forward.py:38-75)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pnpinversion_tpu.parallel.multihost import process_shard


def _reference_prox(noise_text, noise_uncond, prox, quantile, dilate_mask):
    import torch
    import torch.nn.functional as F

    score_delta = torch.from_numpy(noise_text - noise_uncond)
    if quantile > 0:
        threshold = score_delta.abs().quantile(quantile)
    else:
        threshold = -quantile
    if prox == "l1":
        score_delta = score_delta - score_delta.clamp(-threshold, threshold)
        score_delta = torch.where(score_delta > 0, score_delta - threshold, score_delta)
        score_delta = torch.where(score_delta < 0, score_delta + threshold, score_delta)
    else:  # l0
        score_delta = score_delta - score_delta.clamp(-threshold, threshold)
    mask_edit = (score_delta.abs() > threshold).float()
    if dilate_mask > 0:
        radius = int(dilate_mask)
        mask_edit = F.max_pool2d(mask_edit, 2 * radius + 1, 1, radius)
    return score_delta.numpy(), mask_edit.numpy()


def _our_prox(noise_text, noise_uncond, prox, quantile, dilate_mask):
    """Transcribe the traced logic from sampling/p2p_forward.py:215-236."""
    from pnpinversion_tpu.sampling.p2p_forward import _dilate

    delta = jnp.asarray(noise_text) - jnp.asarray(noise_uncond)
    if quantile > 0:
        threshold = jnp.quantile(jnp.abs(delta), quantile)
    else:
        threshold = jnp.asarray(-quantile)
    clamped = jnp.clip(delta, -threshold, threshold)
    shrunk = delta - clamped
    if prox == "l1":
        shrunk = jnp.where(shrunk > 0, shrunk - threshold, shrunk)
        shrunk = jnp.where(shrunk < 0, shrunk + threshold, shrunk)
    mask_edit = (jnp.abs(shrunk) > threshold).astype(jnp.float32)
    if dilate_mask > 0:
        # ours is NHWC; the torch reference pools NCHW
        mask_edit = _dilate(mask_edit.transpose(0, 2, 3, 1), int(dilate_mask))
        mask_edit = mask_edit.transpose(0, 3, 1, 2)
    return np.asarray(shrunk), np.asarray(mask_edit)


@pytest.mark.parametrize("prox", ["l0", "l1"])
@pytest.mark.parametrize("quantile", [0.75, 0.7, -0.1])
def test_prox_math_matches_reference(prox, quantile):
    rng = np.random.RandomState(0)
    nt = rng.randn(2, 4, 16, 16).astype(np.float32)
    nu = rng.randn(2, 4, 16, 16).astype(np.float32)
    ref_delta, ref_mask = _reference_prox(nt, nu, prox, quantile, 1)
    our_delta, our_mask = _our_prox(nt, nu, prox, quantile, 1)
    np.testing.assert_allclose(our_delta, ref_delta, atol=2e-6)
    np.testing.assert_array_equal(our_mask, ref_mask)


def test_process_shard():
    items = list(range(10))
    shards = [process_shard(items, i, 3) for i in range(3)]
    assert sorted(sum(shards, [])) == items
    assert all(abs(len(s) - 10 / 3) < 1.5 for s in shards)
