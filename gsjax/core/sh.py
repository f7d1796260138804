"""Real spherical harmonics, degrees 0-3 (4 accepted for parity).

The polynomial basis and coefficient constants follow the standard real-SH
convention used by PlenOctrees and the reference trainer
(reference: utils/sh_utils.py:26-117); the reference evaluates these either
inside the CUDA kernel or via the `--convert_SHs_python` mirror path
(reference: gaussian_renderer/__init__.py:72-78). Here evaluation is a pure
jnp function, vectorized over leading batch dims, fused by XLA into the
render preprocess.

Color layout note: gsjax stores SH as [..., K, 3] (coefficient-major,
channel-minor), the same memory layout as the reference's concatenated
(features_dc, features_rest) tensors (reference: scene/gaussian_model.py:108-111).
eval_sh therefore contracts over axis -2.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as _np

C0 = 0.28209479177387814
C1 = 0.4886025119029199
C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)
C4 = (
    2.5033429417967046,
    -1.7701307697799304,
    0.9461746957575601,
    -0.6690465435572892,
    0.10578554691520431,
    -0.6690465435572892,
    0.47308734787878004,
    -1.7701307697799304,
    0.6258357354491761,
)


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) ** 2


def sh_basis(deg: int, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the real SH basis functions at unit directions.

    Args:
      deg: static int degree in [0, 4].
      dirs: [..., 3] unit direction vectors.

    Returns:
      [..., (deg+1)**2] basis values, matching the hard-coded polynomial
      expansion of the reference (reference: utils/sh_utils.py:57-112).
    """
    if not (0 <= deg <= 4):
        raise ValueError(f"SH degree must be in [0, 4], got {deg}")
    x, y, z = dirs[..., 0], dirs[..., 1], dirs[..., 2]
    one = jnp.ones_like(x)
    basis = [C0 * one]
    if deg > 0:
        basis += [-C1 * y, C1 * z, -C1 * x]
    if deg > 1:
        xx, yy, zz = x * x, y * y, z * z
        xy, yz, xz = x * y, y * z, x * z
        basis += [
            C2[0] * xy,
            C2[1] * yz,
            C2[2] * (2.0 * zz - xx - yy),
            C2[3] * xz,
            C2[4] * (xx - yy),
        ]
    if deg > 2:
        basis += [
            C3[0] * y * (3.0 * xx - yy),
            C3[1] * xy * z,
            C3[2] * y * (4.0 * zz - xx - yy),
            C3[3] * z * (2.0 * zz - 3.0 * xx - 3.0 * yy),
            C3[4] * x * (4.0 * zz - xx - yy),
            C3[5] * z * (xx - yy),
            C3[6] * x * (xx - 3.0 * yy),
        ]
    if deg > 3:
        basis += [
            C4[0] * xy * (xx - yy),
            C4[1] * yz * (3.0 * xx - yy),
            C4[2] * xy * (7.0 * zz - 1.0),
            C4[3] * yz * (7.0 * zz - 3.0),
            C4[4] * (zz * (35.0 * zz - 30.0) + 3.0),
            C4[5] * xz * (7.0 * zz - 3.0),
            C4[6] * (xx - yy) * (7.0 * zz - 1.0),
            C4[7] * xz * (xx - 3.0 * yy),
            C4[8] * (xx * (xx - 3.0 * yy) - yy * (3.0 * xx - yy)),
        ]
    return jnp.stack(basis, axis=-1)


def eval_sh(deg, sh: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Evaluate SH-encoded color toward unit directions.

    Args:
      deg: active degree (the reference ramps this 0->max during training,
        reference: train.py:72-73). A static int contracts only the active
        bands; a TRACED scalar evaluates the full basis the coefficient
        array carries and masks bands > deg — the exact same linear map
        (inactive coefficients contribute exact zeros, and receive zero
        gradient, like the reference's degree-truncated CUDA eval). Traced
        degree keeps the SH ramp from recompiling the train step per
        degree (remote compiles cost minutes on a tunneled TPU).
      sh: [..., K, C] coefficients with K >= (deg+1)**2.
      dirs: [..., 3] unit directions.

    Returns:
      [..., C] color (NOT including the +0.5 offset/clamp; the render
      preprocess applies `max(result + 0.5, 0)` as the reference does,
      reference: gaussian_renderer/__init__.py:78).
    """
    if isinstance(deg, (int, _np.integer)):
        k = num_sh_coeffs(deg)
        if sh.shape[-2] < k:
            raise ValueError(
                f"need >= {k} SH coeffs for degree {deg}, got {sh.shape[-2]}"
            )
        basis = sh_basis(deg, dirs)  # [..., k]
        # precision=highest: TPU contractions otherwise truncate f32 -> bf16.
        return jnp.einsum(
            "...k,...kc->...c", basis, sh[..., :k, :], precision="highest"
        )

    k = sh.shape[-2]
    max_deg = int(_np.sqrt(k)) - 1
    if num_sh_coeffs(max_deg) != k:
        raise ValueError(f"coefficient count {k} is not a complete SH pyramid")
    basis = sh_basis(max_deg, dirs)  # [..., k]
    band = jnp.asarray(_np.floor(_np.sqrt(_np.arange(k))).astype(_np.int32))
    basis = jnp.where(band <= deg, basis, 0.0)
    return jnp.einsum(
        "...k,...kc->...c", basis, sh, precision="highest"
    )


def RGB2SH(rgb: jnp.ndarray) -> jnp.ndarray:
    """(reference: utils/sh_utils.py:114-115)"""
    return (rgb - 0.5) / C0


def SH2RGB(sh: jnp.ndarray) -> jnp.ndarray:
    """(reference: utils/sh_utils.py:117-118)"""
    return sh * C0 + 0.5
