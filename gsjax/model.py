"""The Gaussian scene model: a fixed-capacity pytree of raw parameters.

TPU-first redesign of the reference GaussianModel (reference:
scene/gaussian_model.py:24-147). Where the reference mutates per-iteration
tensor sizes, gsjax keeps every array at a static CAPACITY with an `alive`
mask so all training steps compile once; densification compacts in place
(gsjax/train/densify.py) and only a capacity growth triggers recompilation.

Parameters are stored RAW (pre-activation), exactly as the reference does:
scaling = log-scale (exp activation), opacity = logit (sigmoid activation),
rotation = unnormalized quaternion (normalize activation)
(reference: scene/gaussian_model.py:26-41).
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gsjax.core.sh import RGB2SH, num_sh_coeffs
from gsjax.core.transforms import build_rotation, inverse_sigmoid


@flax.struct.dataclass
class GaussianParams:
    """Optimizable parameters, capacity-padded.

    xyz: [C,3]; features_dc: [C,1,3]; features_rest: [C,K-1,3];
    scaling: [C,3] (log); rotation: [C,4]; opacity: [C,1] (logit).
    """

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    @property
    def max_sh_degree(self) -> int:
        k = 1 + self.features_rest.shape[1]
        return int(round(k**0.5)) - 1

    # --- activations (reference: scene/gaussian_model.py:95-118) ---------
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.scaling)

    def get_rotation(self) -> jnp.ndarray:
        return self.rotation / jnp.linalg.norm(
            self.rotation, axis=-1, keepdims=True
        ).clip(1e-12)

    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.opacity)

    def get_features(self) -> jnp.ndarray:
        """[C, K, 3] concatenated SH coefficients."""
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def get_rotation_matrices(self) -> jnp.ndarray:
        return build_rotation(self.rotation)


@flax.struct.dataclass
class GaussianAux:
    """Non-optimized per-Gaussian state.

    alive: [C] bool capacity mask.
    max_radii2d: [C] f32 running max screen radius (prune criterion).
    xyz_grad_accum: [C] f32 accumulated screen-space grad norms.
    denom: [C] f32 accumulation counts.
    (reference: scene/gaussian_model.py:53-55,405-407)
    """

    alive: jnp.ndarray
    max_radii2d: jnp.ndarray
    xyz_grad_accum: jnp.ndarray
    denom: jnp.ndarray

    def n_alive(self) -> jnp.ndarray:
        return jnp.sum(self.alive.astype(jnp.int32))

    @classmethod
    def create(cls, capacity: int, n_alive: int) -> "GaussianAux":
        return cls(
            alive=jnp.arange(capacity) < n_alive,
            max_radii2d=jnp.zeros(capacity, jnp.float32),
            xyz_grad_accum=jnp.zeros(capacity, jnp.float32),
            denom=jnp.zeros(capacity, jnp.float32),
        )


def create_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    sh_degree: int,
    capacity: int | None = None,
    knn_dist2: np.ndarray | None = None,
) -> tuple[GaussianParams, GaussianAux]:
    """Initialize the model from a seed point cloud
    (reference: scene/gaussian_model.py:124-147).

    Scales: log(sqrt(max(mean 3-NN squared distance, 1e-7))), isotropic.
    Rotations: identity quaternion. Opacity: sigmoid^-1(0.1).

    Args:
      points/colors: [N,3] float arrays (colors in [0,1]).
      sh_degree: max SH degree (features sized (deg+1)^2).
      capacity: static buffer size; default = next power of two >= N.
      knn_dist2: optional precomputed [N] mean 3-NN squared distances
        (otherwise computed with gsjax.knn.mean_knn_dist2).
    """
    n = points.shape[0]
    if capacity is None:
        capacity = max(1 << (n - 1).bit_length(), 1024)
    if capacity < n:
        raise ValueError(f"capacity {capacity} < point count {n}")
    k = num_sh_coeffs(sh_degree)

    pts = jnp.asarray(points, jnp.float32)
    if knn_dist2 is None:
        # Native Morton/box 3-NN (the simple-knn equivalent) when the C++
        # library is available; exact blocked JAX top-k otherwise.
        from gsjax.native import mean_knn_dist2_native

        native = mean_knn_dist2_native(np.asarray(points, np.float32))
        if native is not None:
            dist2 = jnp.asarray(native)
        else:
            from gsjax.knn import mean_knn_dist2

            dist2 = mean_knn_dist2(pts)
    else:
        dist2 = jnp.asarray(knn_dist2, jnp.float32)
    scales = jnp.log(jnp.sqrt(jnp.maximum(dist2, 1e-7)))[:, None].repeat(3, axis=1)

    f_dc = RGB2SH(jnp.asarray(colors, jnp.float32))[:, None, :]  # [N,1,3]
    f_rest = jnp.zeros((n, k - 1, 3), jnp.float32)
    rots = jnp.zeros((n, 4), jnp.float32).at[:, 0].set(1.0)
    opac = inverse_sigmoid(0.1 * jnp.ones((n, 1), jnp.float32))

    params = pad_gaussian_params(
        xyz=pts,
        features_dc=f_dc,
        features_rest=f_rest,
        scaling=scales,
        rotation=rots,
        opacity=opac,
        capacity=capacity,
    )
    return params, GaussianAux.create(capacity, n)


# Dead-slot fill convention shared by padding, capacity growth, and densify
# compaction: tiny log-scale, ~zero logit opacity, identity quaternion —
# masked math stays finite (zero quats would NaN on normalize).
DEAD_SCALING_FILL = -10.0
DEAD_OPACITY_FILL = -10.0


def pad_gaussian_params(
    *,
    xyz,
    features_dc,
    features_rest,
    scaling,
    rotation,
    opacity,
    capacity: int,
) -> GaussianParams:
    """Pad per-Gaussian arrays of length n to `capacity` with the dead-slot
    fill convention. Raises if capacity is too small."""
    n = xyz.shape[0]
    if capacity < n:
        raise ValueError(f"capacity ({capacity}) < point count ({n})")

    def pad(x, fill=0.0):
        return jnp.pad(
            jnp.asarray(x),
            [(0, capacity - n)] + [(0, 0)] * (x.ndim - 1),
            constant_values=fill,
        )

    return GaussianParams(
        xyz=pad(xyz),
        features_dc=pad(features_dc),
        features_rest=pad(features_rest),
        scaling=pad(scaling, fill=DEAD_SCALING_FILL),
        rotation=pad(rotation).at[n:, 0].set(1.0),
        opacity=pad(opacity, fill=DEAD_OPACITY_FILL),
    )
