"""Training losses: L1 and SSIM.

SSIM matches the reference implementation bit-for-bit in spirit: 11x11
Gaussian window, sigma=1.5, per-channel (depthwise) convolution with ZERO
padding, C1=0.01^2, C2=0.03^2 (reference: utils/loss_utils.py:23-63).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np
from jax import lax


def l1_loss(output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(reference: utils/loss_utils.py:17-18)"""
    return jnp.mean(jnp.abs(output - gt))


def l2_loss(output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """(reference: utils/loss_utils.py:20-21)"""
    return jnp.mean((output - gt) ** 2)


@functools.lru_cache(maxsize=4)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """Normalized separable Gaussian window, [1, 1, W, W]
    (reference: utils/loss_utils.py:23-31)."""
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    g /= g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d[None, None]


def _depthwise_conv(img: jnp.ndarray, window: jnp.ndarray, pad: int) -> jnp.ndarray:
    """[C,H,W] zero-padded depthwise conv (torch F.conv2d groups=C parity)."""
    c = img.shape[0]
    kernel = jnp.broadcast_to(window, (c, 1, window.shape[2], window.shape[3]))
    return lax.conv_general_dilated(
        img[None],
        kernel,
        window_strides=(1, 1),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        precision=lax.Precision.HIGHEST,
    )[0]


def ssim(
    img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11, sigma: float = 1.5
) -> jnp.ndarray:
    """Mean SSIM over a [C,H,W] image pair (reference: utils/loss_utils.py:33-63)."""
    window = jnp.asarray(_gaussian_window(window_size, sigma))
    pad = window_size // 2
    mu1 = _depthwise_conv(img1, window, pad)
    mu2 = _depthwise_conv(img2, window, pad)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window, pad) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window, pad) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window, pad) - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    return jnp.mean(ssim_map)
