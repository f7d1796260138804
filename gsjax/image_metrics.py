"""Image quality metrics: MSE, PSNR (reference: utils/image_utils.py:14-19)
and LPIPS (reference: lpipsPyTorch/).

LPIPS here is the v0.1 network re-implemented in JAX: a VGG16 (or AlexNet)
feature trunk with unit-normalized activations and pretrained 1x1 linear
heads. The reference downloads pretrained torchvision + richzhang weights at
runtime (reference: lpipsPyTorch/modules/utils.py:11); this environment has
no network egress and no torchvision, so weights must be supplied as an
.npz via `GSJAX_LPIPS_WEIGHTS` (or the `weights` argument). Without weights
LPIPS is unavailable and callers should skip it (lpips_available()).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image mean squared error over flattened pixels
    (reference: utils/image_utils.py:14-15). Accepts [C,H,W] or [B,C,H,W]."""
    if img1.ndim == 3:
        img1, img2 = img1[None], img2[None]
    return jnp.mean(
        (img1 - img2) ** 2, axis=tuple(range(1, img1.ndim)), keepdims=True
    )


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """20 * log10(1 / sqrt(mse)) per image (reference:
    utils/image_utils.py:17-19)."""
    m = mse(img1, img2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


# --------------------------------------------------------------------------
# LPIPS v0.1 (JAX)
# --------------------------------------------------------------------------

# Input z-score constants of the reference's BaseNet (reference:
# lpipsPyTorch/modules/networks.py:44-52). NOTE: the reference applies
# (x - mean) / std to the [0,1] image DIRECTLY (networks.py:58-60) — it
# does NOT remap to [-1,1] first like the original richzhang ScalingLayer.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# VGG16 conv layout: (out_channels, n_convs) per block; features tapped
# after each block's ReLU (layers 3, 8, 15, 22, 29 in torchvision indexing).
_VGG_BLOCKS = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))


def lpips_weights_path() -> str | None:
    p = os.environ.get("GSJAX_LPIPS_WEIGHTS")
    if p and os.path.exists(p):
        return p
    here = os.path.dirname(__file__)
    for default in (
        os.path.join(here, "weights", "lpips_vgg.npz"),
        os.path.join(here, "..", "weights", "lpips_vgg.npz"),
    ):
        if os.path.exists(default):
            return default
    return None


def lpips_available() -> bool:
    return lpips_weights_path() is not None


@functools.lru_cache(maxsize=1)
def _load_weights(path: str):
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files}


def _conv(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """3x3 same conv, NCHW / OIHW."""
    y = lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=("NCHW", "OIHW", "NCHW")
    )
    return y + b[None, :, None, None]


def _vgg_features(x: jnp.ndarray, weights) -> list[jnp.ndarray]:
    feats = []
    idx = 0
    for out_ch, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            x = jax.nn.relu(_conv(x, weights[f"conv{idx}.w"], weights[f"conv{idx}.b"]))
            idx += 1
        feats.append(x)
        x = lax.reduce_window(
            x, -jnp.inf, lax.max, (1, 1, 2, 2), (1, 1, 2, 2), "VALID"
        )
    return feats


def lpips(
    x: jnp.ndarray, y: jnp.ndarray, net_type: str = "vgg", weights: str | None = None
) -> jnp.ndarray:
    """LPIPS distance between [C,H,W] or [B,C,H,W] images in [0,1]
    (reference: lpipsPyTorch/__init__.py:6-19).

    Raises RuntimeError when no pretrained weights are available
    (zero-egress environment); guard with lpips_available().
    """
    if net_type != "vgg":
        raise NotImplementedError("gsjax LPIPS supports net_type='vgg'")
    path = weights or lpips_weights_path()
    if path is None:
        raise RuntimeError(
            "LPIPS weights unavailable: set GSJAX_LPIPS_WEIGHTS to an .npz "
            "with conv{i}.w/.b VGG16 weights and lin{i}.w heads"
        )
    w = _load_weights(path)
    if x.ndim == 3:
        x, y = x[None], y[None]
    shift = jnp.asarray(_SHIFT)[None, :, None, None]
    scale = jnp.asarray(_SCALE)[None, :, None, None]
    xn = (x - shift) / scale
    yn = (y - shift) / scale
    fx = _vgg_features(xn, w)
    fy = _vgg_features(yn, w)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        # Unit-normalize along channels, eps ADDED to the norm (reference:
        # lpipsPyTorch/modules/utils.py:6-8).
        a = a / (jnp.linalg.norm(a, axis=1, keepdims=True) + 1e-10)
        b = b / (jnp.linalg.norm(b, axis=1, keepdims=True) + 1e-10)
        d = (a - b) ** 2
        head = w[f"lin{i}.w"]  # [1, C, 1, 1]
        total = total + jnp.mean(jnp.sum(d * head, axis=1), axis=(1, 2))
    return total


def expected_lpips_members() -> dict[str, tuple[int, ...]]:
    """Key -> shape table of the LPIPS weights npz — the byte-level contract
    of gsjax/weights/LPIPS_WEIGHTS_SPEC.md (all members little-endian f32)."""
    shapes: dict[str, tuple[int, ...]] = {}
    idx = 0
    in_ch = 3
    for out_ch, n_convs in _VGG_BLOCKS:
        for _ in range(n_convs):
            shapes[f"conv{idx}.w"] = (out_ch, in_ch, 3, 3)
            shapes[f"conv{idx}.b"] = (out_ch,)
            in_ch = out_ch
            idx += 1
    for i, (out_ch, _) in enumerate(_VGG_BLOCKS):
        shapes[f"lin{i}.w"] = (1, out_ch, 1, 1)
    return shapes


def check_lpips_weights(path: str) -> str:
    """Validate a dropped weights file against the spec; returns its sha256.

    Raises ValueError with every violation listed (missing/extra keys, shape
    or dtype mismatches, non-finite values)."""
    import hashlib

    z = np.load(path)
    expected = expected_lpips_members()
    errors = []
    for k in sorted(set(expected) - set(z.files)):
        errors.append(f"missing member {k}")
    for k in sorted(set(z.files) - set(expected)):
        errors.append(f"unexpected member {k}")
    for k in sorted(set(expected) & set(z.files)):
        a = z[k]
        if tuple(a.shape) != expected[k]:
            errors.append(f"{k}: shape {tuple(a.shape)} != {expected[k]}")
        if a.dtype != np.float32:
            errors.append(f"{k}: dtype {a.dtype} != float32")
        elif not np.isfinite(a).all():
            errors.append(f"{k}: contains non-finite values")
    if errors:
        raise ValueError(
            f"{path} does not match LPIPS_WEIGHTS_SPEC.md:\n  "
            + "\n  ".join(errors)
        )
    with open(path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--check-weights", metavar="PATH",
                    help="validate an LPIPS weights npz against the spec")
    cli_args = ap.parse_args()
    if cli_args.check_weights:
        digest = check_lpips_weights(cli_args.check_weights)
        print(f"OK: {cli_args.check_weights} matches LPIPS_WEIGHTS_SPEC.md")
        print(f"sha256: {digest}")
