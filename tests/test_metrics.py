"""Metric math vs torchmetrics oracles (PSNR/SSIM/MSE are weight-free), plus
shape/pipeline checks for the model-based metrics on tiny configs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pnpinversion_tpu.evaluation import metrics as M


@pytest.fixture(scope="module")
def imgs():
    rng = np.random.RandomState(0)
    a = rng.rand(64, 64, 3).astype(np.float32)
    b = np.clip(a + rng.randn(64, 64, 3).astype(np.float32) * 0.1, 0, 1)
    return a, b


def test_mse_psnr_closed_form(imgs):
    a, b = imgs
    ref_mse = float(np.mean((a - b) ** 2))
    ref_psnr = float(10 * np.log10(1.0 / ref_mse))
    assert float(M.mse(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(ref_mse, rel=1e-5)
    assert float(M.psnr(jnp.asarray(a), jnp.asarray(b))) == pytest.approx(ref_psnr, rel=1e-4)


def test_ssim_matches_scipy_reference(imgs):
    """Independent scipy implementation of gaussian-window SSIM
    (torchmetrics' configuration: 11x11, sigma 1.5, data_range 1, valid crop)."""
    from scipy.signal import convolve2d

    a, b = imgs
    coords = np.arange(11) - 5
    g = np.exp(-(coords**2) / (2 * 1.5**2))
    g = np.outer(g, g)
    g /= g.sum()

    def filt(z):
        return np.stack([convolve2d(z[:, :, c], g, mode="valid") for c in range(3)], -1)

    mu_a, mu_b = filt(a), filt(b)
    sa = filt(a * a) - mu_a**2
    sb = filt(b * b) - mu_b**2
    sab = filt(a * b) - mu_a * mu_b
    c1, c2 = 0.01**2, 0.03**2
    ref = np.mean(((2 * mu_a * mu_b + c1) * (2 * sab + c2))
                  / ((mu_a**2 + mu_b**2 + c1) * (sa + sb + c2)))
    ours = float(M.ssim(jnp.asarray(a), jnp.asarray(b)))
    assert ours == pytest.approx(float(ref), abs=1e-4)
    assert float(M.ssim(jnp.asarray(a), jnp.asarray(a))) == pytest.approx(1.0, abs=1e-5)


def test_lpips_properties():
    from pnpinversion_tpu.models.lpips import init_lpips_params, lpips

    params = init_lpips_params(jax.random.PRNGKey(0))
    rng = np.random.RandomState(1)
    a = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    b = jnp.asarray(rng.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    d_aa = float(lpips(params, a, a))
    d_ab = float(lpips(params, a, b))
    assert d_aa == pytest.approx(0.0, abs=1e-6)
    assert d_ab > 0


def test_squeezenet_feature_shapes():
    """Tap channel counts must match the lpips squeeze configuration."""
    from pnpinversion_tpu.models.lpips import (
        LPIPS_CHANNELS,
        init_lpips_params,
        squeeze_features,
    )

    params = init_lpips_params(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    taps = squeeze_features(params, x)
    assert [t.shape[-1] for t in taps] == LPIPS_CHANNELS
    # 224 input: torchvision squeezenet1_1 spatial sizes at the lpips taps
    # (relu1=111, fire4=55, fire7=27, fire9..12=13)
    taps224 = squeeze_features(params, jnp.zeros((1, 224, 224, 3)))
    assert [t.shape[1] for t in taps224] == [111, 55, 27, 13, 13, 13, 13]


def test_calculator_tiny_pipeline():
    from pnpinversion_tpu.evaluation.calculator import MetricsCalculator

    calc = MetricsCalculator(tiny=True)
    rng = np.random.RandomState(2)
    a = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    b = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
    mask = np.ones((64, 64, 3), np.float32)
    assert np.isfinite(calc.calculate_psnr(a, b))
    assert np.isfinite(calc.calculate_ssim(a, b, mask, mask))
    assert np.isfinite(calc.calculate_lpips(a, b))
    assert np.isfinite(calc.calculate_mse(a, b))
    s = calc.calculate_clip_similarity(a, "a cat", None)
    assert 0 <= s <= 100
    assert np.isfinite(calc.calculate_structure_distance(a, b))


def test_evaluate_dispatch_nan_sentinels():
    from pnpinversion_tpu.evaluation.calculator import MetricsCalculator
    from pnpinversion_tpu.evaluation.evaluate import calculate_metric

    calc = MetricsCalculator(tiny=True)
    rng = np.random.RandomState(3)
    a = (rng.rand(32, 32, 3) * 255).astype(np.uint8)
    full = np.ones((32, 32, 3), np.float32)
    assert calculate_metric(calc, "psnr_unedit_part", a, a, full, full, "", "") == "nan"
    empty = np.zeros((32, 32, 3), np.float32)
    assert calculate_metric(calc, "mse_edit_part", a, a, empty, empty, "", "") == "nan"
    v = calculate_metric(calc, "mse", a, a, None, None, "", "")
    assert v == pytest.approx(0.0, abs=1e-7)


def test_registry_matches_reference_folders():
    from pnpinversion_tpu.evaluation.evaluate import all_tgt_image_folders

    reg = all_tgt_image_folders()
    assert reg["1_directinversion+p2p"] == "output/directinversion+p2p/annotation_images"
    assert reg["6_ablation_directinversion_interval_2"].endswith(
        "ablation_directinversion_interval_2+p2p/annotation_images")
    assert reg["4_null-text-inverse+p2p_a800"].endswith(
        "null-text-inversion+p2p_a800/annotation_images")
    assert len([k for k in reg if k.startswith("3_")]) == 20
