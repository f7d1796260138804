"""Training losses: L1 and SSIM.

SSIM matches the reference implementation bit-for-bit in spirit: 11x11
Gaussian window, sigma=1.5, per-channel (depthwise) convolution with ZERO
padding, C1=0.01^2, C2=0.03^2 (reference: utils/loss_utils.py:23-63).
"""

from __future__ import annotations

import functools

import jax
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


def _ssim_terms(img1, img2, window_size, sigma, pad_h):
    """Conv outputs and the four SSIM factor maps A,B,C,D with
    S = A*B/(C*D) (same algebra as the reference's fraction,
    utils/loss_utils.py:52-63)."""
    window = _gaussian_taps(window_size, sigma)
    pad = window_size // 2
    mu1 = _depthwise_conv(img1, window, pad, pad_h)
    mu2 = _depthwise_conv(img2, window, pad, pad_h)
    e1 = _depthwise_conv(img1 * img1, window, pad, pad_h)
    e2 = _depthwise_conv(img2 * img2, window, pad, pad_h)
    e12 = _depthwise_conv(img1 * img2, window, pad, pad_h)
    c1 = 0.01**2
    c2 = 0.03**2
    a = 2.0 * mu1 * mu2 + c1
    b = 2.0 * (e12 - mu1 * mu2) + c2
    c = mu1 * mu1 + mu2 * mu2 + c1
    d = (e1 - mu1 * mu1) + (e2 - mu2 * mu2) + c2
    return mu1, mu2, a, b, c, d


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
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
    those rows).

    Closed-form VJP: autodiff of the slice-FMA window expands the conv
    transpose into one image-rate pad per tap (~40 materialized [C,H,W]
    pad fusions in the compiled backward — tools/cpu_ssim_fusion_probe.py);
    the hand-written backward is 4 adjoint window convs + elementwise maps.
    """
    _, _, a, b, c, d = _ssim_terms(img1, img2, window_size, sigma, pad_h)
    return (a * b) / (c * d)


def _ssim_map_fwd(img1, img2, window_size, sigma, pad_h):
    mu1, mu2, a, b, c, d = _ssim_terms(img1, img2, window_size, sigma, pad_h)
    return (a * b) / (c * d), (img1, img2, mu1, mu2, a, b, c, d)


def _ssim_map_bwd(window_size, sigma, pad_h, res, u):
    """d/dimg of S = A*B/(C*D) through the five window convs.

    With G the (self-adjoint: symmetric taps, zero padding) window conv and
    G* its adjoint, writing p = u*B/(CD), q = u*A/(CD), r = -q*B/C,
    t = -q*B/D:
      d_img1 = G*(2(mu2(p-q) + mu1(r-t))) + 2 img1 G*(t) + img2 G*(2q)
      d_img2 = G*(2(mu1(p-q) + mu2(r-t))) + 2 img2 G*(t) + img1 G*(2q)
    For pad_h=False the H pass is VALID over caller-supplied halo rows; its
    adjoint is the SAME conv of the zero-row-padded cotangent (FULL conv,
    symmetric taps)."""
    img1, img2, mu1, mu2, a, b, c, d = res
    window = _gaussian_taps(window_size, sigma)
    pad = window_size // 2

    if pad_h:
        gstar = lambda y: _depthwise_conv(y, window, pad, True)
    else:
        gstar = lambda y: _depthwise_conv(
            jnp.pad(y, ((0, 0), (pad, pad), (0, 0))), window, pad, True
        )

    inv_cd = 1.0 / (c * d)
    p = u * b * inv_cd
    q = u * a * inv_cd
    qb = q * b
    r = -qb / c
    t = -qb / d
    pq = p - q
    rt = r - t
    g_mu1 = 2.0 * (mu2 * pq + mu1 * rt)
    g_mu2 = 2.0 * (mu1 * pq + mu2 * rt)
    gt = gstar(t)
    gq2 = gstar(2.0 * q)
    d1 = gstar(g_mu1) + 2.0 * img1 * gt + img2 * gq2
    d2 = gstar(g_mu2) + 2.0 * img2 * gt + img1 * gq2
    return d1, d2


ssim_map.defvjp(_ssim_map_fwd, _ssim_map_bwd)


def ssim(
    img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11, sigma: float = 1.5
) -> jnp.ndarray:
    """Mean SSIM over a [C,H,W] image pair (reference: utils/loss_utils.py:33-63)."""
    return jnp.mean(ssim_map(img1, img2, window_size, sigma))
