"""Quaternion / covariance math for anisotropic 3D Gaussians.

Semantics pinned by the reference's Python mirrors
(reference: utils/general_utils.py:64-110, scene/gaussian_model.py:26-41):
a Gaussian's 3D covariance is Sigma = L L^T with L = R(q) * diag(s), stored
as the upper-triangular 6-vector (xx, xy, xz, yy, yz, zz). All functions are
pure jnp, batched over a leading axis, f32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inverse_sigmoid(x: jnp.ndarray) -> jnp.ndarray:
    """logit; used for opacity init/reset (reference: utils/general_utils.py:18-19)."""
    return jnp.log(x / (1.0 - x))


def build_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Normalized quaternion (w, x, y, z) -> rotation matrix.

    Matches the component layout of the reference
    (reference: utils/general_utils.py:78-98).

    Args:
      q: [..., 4] possibly-unnormalized quaternions.

    Returns:
      [..., 3, 3] rotation matrices.
    """
    norm = jnp.sqrt(jnp.sum(q * q, axis=-1, keepdims=True))
    q = q / norm
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    row0 = jnp.stack(
        [1.0 - 2.0 * (y * y + z * z), 2.0 * (x * y - r * z), 2.0 * (x * z + r * y)],
        axis=-1,
    )
    row1 = jnp.stack(
        [2.0 * (x * y + r * z), 1.0 - 2.0 * (x * x + z * z), 2.0 * (y * z - r * x)],
        axis=-1,
    )
    row2 = jnp.stack(
        [2.0 * (x * z - r * y), 2.0 * (y * z + r * x), 1.0 - 2.0 * (x * x + y * y)],
        axis=-1,
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def build_scaling_rotation(s: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """L = R(q) @ diag(s) (reference: utils/general_utils.py:100-110).

    Args:
      s: [..., 3] (post-activation, i.e. exp of the raw parameter).
      q: [..., 4] quaternions.
    """
    rot = build_rotation(q)
    return rot * s[..., None, :]


def strip_symmetric(sym: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] symmetric -> [..., 6] upper triangle (xx, xy, xz, yy, yz, zz)
    (reference: utils/general_utils.py:64-77)."""
    return jnp.stack(
        [
            sym[..., 0, 0],
            sym[..., 0, 1],
            sym[..., 0, 2],
            sym[..., 1, 1],
            sym[..., 1, 2],
            sym[..., 2, 2],
        ],
        axis=-1,
    )


def build_covariance(
    scaling: jnp.ndarray, scaling_modifier: float | jnp.ndarray, rotation: jnp.ndarray
) -> jnp.ndarray:
    """3D covariance 6-vector from activated scale + quaternion
    (reference: scene/gaussian_model.py:26-31).

    Args:
      scaling: [..., 3] post-exp scales.
      scaling_modifier: global scale multiplier (viewer slider).
      rotation: [..., 4] quaternions (normalized inside).

    Returns:
      [..., 6] upper-triangular covariance.
    """
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    sigma = jnp.matmul(
        L, jnp.swapaxes(L, -1, -2), precision=jax.lax.Precision.HIGHEST
    )
    return strip_symmetric(sigma)


def cov6_to_mat(cov6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] upper triangle -> [..., 3, 3] full symmetric matrix."""
    xx, xy, xz, yy, yz, zz = (cov6[..., i] for i in range(6))
    row0 = jnp.stack([xx, xy, xz], axis=-1)
    row1 = jnp.stack([xy, yy, yz], axis=-1)
    row2 = jnp.stack([xz, yz, zz], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)
