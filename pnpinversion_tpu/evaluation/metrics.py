"""Image-quality metrics on device (jnp), matching the reference's
torchmetrics configuration (/root/reference/evaluation/matrics_calculator.py:271-288):

- PSNR(data_range=1), MSE, SSIM(data_range=1, gaussian 11x11 sigma 1.5)
- masked variants multiply the image by the mask BEFORE the metric
  (:309-314) — a quirk preserved for table parity.
- LPIPS (SqueezeNet), CLIP similarity and DINO structure distance live in
  their model modules; this file has the closed-form metrics.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def mse(img_pred: Array, img_gt: Array) -> Array:
    """Mean squared error over all elements (images in [0,1])."""
    d = img_pred.astype(jnp.float32) - img_gt.astype(jnp.float32)
    return jnp.mean(d * d)


def psnr(img_pred: Array, img_gt: Array, data_range: float = 1.0) -> Array:
    """PSNR with data_range=1 (torchmetrics PeakSignalNoiseRatio semantics)."""
    m = mse(img_pred, img_gt)
    return 10.0 * jnp.log10(data_range**2 / m)


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> Array:
    coords = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2.0
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(img_pred: Array, img_gt: Array, data_range: float = 1.0,
         kernel_size: int = 11, sigma: float = 1.5,
         k1: float = 0.01, k2: float = 0.03) -> Array:
    """SSIM matching torchmetrics StructuralSimilarityIndexMeasure defaults
    (gaussian kernel, same-size valid region via reflection-free conv crop).

    img: (H, W, C) or (B, H, W, C) in [0,1].
    """
    if img_pred.ndim == 3:
        img_pred = img_pred[None]
        img_gt = img_gt[None]
    x = img_pred.astype(jnp.float32)
    y = img_gt.astype(jnp.float32)
    kern = _gaussian_kernel(kernel_size, sigma)[:, :, None, None]  # HWIO i=1,o=1
    c = x.shape[-1]

    def filt(z):
        # depthwise gaussian blur, VALID padding (torchmetrics crops borders)
        z = jnp.moveaxis(z, -1, 1).reshape(-1, z.shape[1], z.shape[2], 1)
        out = jax.lax.conv_general_dilated(
            z, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        out = out.reshape(x.shape[0], c, out.shape[1], out.shape[2])
        return jnp.moveaxis(out, 1, -1)

    mu_x = filt(x)
    mu_y = filt(y)
    sigma_x = filt(x * x) - mu_x * mu_x
    sigma_y = filt(y * y) - mu_y * mu_y
    sigma_xy = filt(x * y) - mu_x * mu_y
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    num = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    den = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.mean(num / den)


def center_crop_resize_224(img: Array, size: int = 224, method: str = "bicubic") -> Array:
    """CLIP preprocessing: resize shortest side to 224 then center crop.
    img: (H, W, C) float."""
    h, w, c = img.shape
    # long-side size truncates (int(), not round()) to match transformers'
    # get_resize_output_image_size, which torchmetrics CLIPScore preprocessing
    # uses — a round() here shifts the center crop by one pixel
    if h <= w:
        nh, nw = size, max(size, int(w * size / h))
    else:
        nh, nw = max(size, int(h * size / w)), size
    img = jax.image.resize(img, (nh, nw, c), method=method)
    top = (nh - size) // 2
    left = (nw - size) // 2
    return img[top : top + size, left : left + size]


CLIP_MEAN = jnp.array([0.48145466, 0.4578275, 0.40821073])
CLIP_STD = jnp.array([0.26862954, 0.26130258, 0.27577711])
IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def clip_normalize(img01: Array) -> Array:
    return (img01 - CLIP_MEAN) / CLIP_STD


def imagenet_normalize(img: Array) -> Array:
    """NOTE: the reference feeds 0..255-scale floats into this transform for
    the structure distance (matrics_calculator.py:382-391) — we keep the same
    behavior; callers decide the input scale."""
    return (img - IMAGENET_MEAN) / IMAGENET_STD
