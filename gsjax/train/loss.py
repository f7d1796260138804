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
def _gaussian_taps(window_size: int, sigma: float) -> tuple[float, ...]:
    """Normalized 1-D Gaussian taps (reference: utils/loss_utils.py:23-31;
    the reference's 2-D window is their outer product)."""
    xs = np.arange(window_size, dtype=np.float64)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    g /= g.sum()
    return tuple(float(v) for v in g.astype(np.float32))


def _depthwise_conv(
    img: jnp.ndarray, taps, pad: int, pad_h: bool = True
) -> jnp.ndarray:
    """[C,H,W] zero-padded depthwise conv of the separable window
    (torch F.conv2d groups=C parity — the 2-D kernel is outer(g, g), so
    row-then-column 1-D passes are the exact same linear map).

    TPU-native form: XLA lowers an NCHW 11x11 conv with C=3 into a
    channel-minor layout that uses 3 of 128 lanes — 20.7 ms per conv at
    1080p, 8 convs = 166 ms of the 323 ms train step (measured via the
    xplane trace, tools/trace_step.py). Two static slice-FMA chains keep
    the natural (H sublanes, W lanes) layout instead: ~boundary-free VPU
    passes, no layout copies.

    pad_h=False runs the H pass in VALID mode (output H = input H - 2*pad):
    the caller supplies its own 2*pad halo rows. Used by the tile-sharded
    loss, where each device owns a horizontal slab and exchanges pad-row
    halos instead of all_gathering the full image."""
    k = len(taps)
    h, w = img.shape[-2], img.shape[-1]
    xp = jnp.pad(img, ((0, 0), (0, 0), (pad, pad)))
    row = taps[0] * lax.slice_in_dim(xp, 0, w, axis=2)
    for i in range(1, k):
        row = row + taps[i] * lax.slice_in_dim(xp, i, i + w, axis=2)
    if pad_h:
        rp = jnp.pad(row, ((0, 0), (pad, pad), (0, 0)))
        h_out = h
    else:
        rp = row
        h_out = h - 2 * pad
    out = taps[0] * lax.slice_in_dim(rp, 0, h_out, axis=1)
    for i in range(1, k):
        out = out + taps[i] * lax.slice_in_dim(rp, i, i + h_out, axis=1)
    return out


def ssim_map(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    pad_h: bool = True,
) -> jnp.ndarray:
    """Per-pixel SSIM map of a [C,H,W] pair (reference:
    utils/loss_utils.py:43-63). With pad_h=False the inputs must carry
    window_size//2 halo rows top and bottom; the map covers only the
    interior rows (exactly what a full-image computation would produce for
    those rows)."""
    window = _gaussian_taps(window_size, sigma)
    pad = window_size // 2
    mu1 = _depthwise_conv(img1, window, pad, pad_h)
    mu2 = _depthwise_conv(img2, window, pad, pad_h)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window, pad, pad_h) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window, pad, pad_h) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window, pad, pad_h) - mu1_mu2
    c1 = 0.01**2
    c2 = 0.03**2
    return ((2.0 * mu1_mu2 + c1) * (2.0 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim(
    img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11, sigma: float = 1.5
) -> jnp.ndarray:
    """Mean SSIM over a [C,H,W] image pair (reference: utils/loss_utils.py:33-63)."""
    return jnp.mean(ssim_map(img1, img2, window_size, sigma))
