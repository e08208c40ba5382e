"""LPIPS vs an independent torch transcription (r1 VERDICT missing #5).

The reference's LPIPS backend is torchmetrics
``LearnedPerceptualImagePatchSimilarity(net_type='squeeze')``
(/root/reference/evaluation/matrics_calculator.py:276), which wraps the
lpips package: torchvision squeezenet1_1 features tapped at 7 ReLU points,
scaling layer, per-channel unit-normalized feature differences, learned 1x1
heads, spatial average, sum. Neither torchmetrics nor torchvision is
installable here (zero egress), so this oracle transcribes that exact
network in torch from the published architecture and runs it on the SAME
weights as our JAX model — two independent implementations must agree.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _torch_squeeze_features(params, x):
    """torchvision squeezenet1_1 features with LPIPS tap points, in torch.
    params: our JAX param pytree (kernels HWIO); x: (B,3,H,W) torch."""
    import math

    import torch
    import torch.nn.functional as F

    def conv(p, x, stride=1, pad=0):
        w = torch.from_numpy(np.asarray(p["kernel"]).transpose(3, 2, 0, 1).copy())
        b = torch.from_numpy(np.asarray(p["bias"]))
        return F.conv2d(x, w, b, stride=stride, padding=pad)

    def maxpool_ceil(x):
        return F.max_pool2d(x, 3, 2, ceil_mode=True)

    def fire(p, x):
        s = F.relu(conv(p["squeeze"], x))
        e1 = F.relu(conv(p["expand1"], s))
        e3 = F.relu(conv(p["expand3"], s, pad=1))
        return torch.cat([e1, e3], dim=1)

    taps = []
    h = F.relu(conv(params["conv0"], x, stride=2))  # pad 0 like torchvision
    taps.append(h)
    h = maxpool_ceil(h)
    h = fire(params["fires"][0], h)
    h = fire(params["fires"][1], h)
    taps.append(h)
    h = maxpool_ceil(h)
    h = fire(params["fires"][2], h)
    h = fire(params["fires"][3], h)
    taps.append(h)
    h = maxpool_ceil(h)
    h = fire(params["fires"][4], h)
    taps.append(h)
    h = fire(params["fires"][5], h)
    taps.append(h)
    h = fire(params["fires"][6], h)
    taps.append(h)
    h = fire(params["fires"][7], h)
    taps.append(h)
    return taps


def _torch_lpips(params, img0, img1):
    """The lpips scoring formula in torch. img: (B,3,H,W) in [-1,1]."""
    import torch

    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def norm(f, eps=1e-10):
        n = torch.sqrt((f**2).sum(dim=1, keepdim=True))
        return f / (n + eps)

    f0 = _torch_squeeze_features(params, (img0 - shift) / scale)
    f1 = _torch_squeeze_features(params, (img1 - shift) / scale)
    total = torch.zeros(())
    for t0, t1, lin in zip(f0, f1, params["lins"]):
        d = (norm(t0) - norm(t1)) ** 2
        w = torch.from_numpy(
            np.asarray(lin["kernel"]).transpose(3, 2, 0, 1).copy())
        head = torch.nn.functional.conv2d(d, w)
        total = total + head.mean(dim=(1, 2, 3)).sum()
    return float(total)


@pytest.mark.parametrize("size", [64, 37])  # 37: odd size exercises ceil pools
def test_lpips_matches_torch_transcription(size):
    import torch

    from pnpinversion_tpu.models.lpips import init_lpips_params, lpips

    params = jax.tree.map(np.asarray, init_lpips_params(jax.random.PRNGKey(3)))
    rng = np.random.RandomState(0)
    a = (rng.rand(1, size, size, 3).astype(np.float32)) * 2 - 1
    b = np.clip(a + rng.randn(1, size, size, 3).astype(np.float32) * 0.2, -1, 1)

    ours = float(lpips(params, jnp.asarray(a), jnp.asarray(b)))
    with torch.no_grad():
        ref = _torch_lpips(params,
                           torch.from_numpy(a.transpose(0, 3, 1, 2).copy()),
                           torch.from_numpy(b.transpose(0, 3, 1, 2).copy()))
    assert ours == pytest.approx(ref, rel=1e-4, abs=1e-5)
    assert float(lpips(params, jnp.asarray(a), jnp.asarray(a))) == pytest.approx(0.0, abs=1e-6)
