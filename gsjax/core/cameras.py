"""Camera model and projective math.

gsjax uses the standard column-vector convention internally
(x_cam = view @ x_world, clip = proj @ view @ x_world); the reference stores
the transposed (row-vector, glm-style) matrices
(reference: scene/cameras.py:54-57) — `Camera.from_colmap` produces
numerically identical geometry from the same (R, T, FoV) inputs, and the
transposed forms are exposed for viewer-protocol parity.

znear/zfar and the OpenGL-style projection mirror the reference
(reference: scene/cameras.py:47-48, utils/graphics_utils.py:51-71).
"""

from __future__ import annotations

import math

import flax.struct
import jax.numpy as jnp
import numpy as np

ZNEAR = 0.01
ZFAR = 100.0


def fov2focal(fov: float, pixels: float) -> float:
    """(reference: utils/graphics_utils.py:73-74)"""
    return pixels / (2.0 * math.tan(fov / 2.0))


def focal2fov(focal: float, pixels: float) -> float:
    """(reference: utils/graphics_utils.py:76-77)"""
    return 2.0 * math.atan(pixels / (2.0 * focal))


def world_to_view(
    R: np.ndarray,
    t: np.ndarray,
    translate: np.ndarray | None = None,
    scale: float = 1.0,
) -> np.ndarray:
    """World-to-camera 4x4 (column-vector convention).

    Args:
      R: [3,3] rotation stored COLMAP-style already transposed, i.e. R is
        the camera-to-world rotation (the reference stores
        `np.transpose(qvec2rotmat(qvec))`, reference:
        scene/dataset_readers.py:83, and re-transposes inside
        getWorld2View2, reference: utils/graphics_utils.py:38-48).
      t: [3] COLMAP translation (world-to-camera).
      translate/scale: optional recentering of the camera center
        (reference: utils/graphics_utils.py:42-47).
    """
    Rt = np.zeros((4, 4), dtype=np.float64)
    Rt[:3, :3] = R.T
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    if translate is not None or scale != 1.0:
        translate = np.zeros(3) if translate is None else np.asarray(translate)
        c2w = np.linalg.inv(Rt)
        cam_center = (c2w[:3, 3] + translate) * scale
        c2w[:3, 3] = cam_center
        Rt = np.linalg.inv(c2w)
    return Rt.astype(np.float32)


def projection_matrix(znear: float, zfar: float, fov_x: float, fov_y: float) -> np.ndarray:
    """OpenGL-style perspective with z in [0, zfar/(zfar-znear)] convention
    (reference: utils/graphics_utils.py:51-71). Column-vector form."""
    tan_y = math.tan(fov_y / 2.0)
    tan_x = math.tan(fov_x / 2.0)
    P = np.zeros((4, 4), dtype=np.float32)
    P[0, 0] = 1.0 / tan_x
    P[1, 1] = 1.0 / tan_y
    P[2, 2] = zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    P[3, 2] = 1.0
    return P


@flax.struct.dataclass
class Camera:
    """A single camera, ready for rendering. Pytree of f32 arrays; image
    dims are static fields so rendered shapes stay compile-time constants.

    view: [4,4] world->camera (column-vector).
    full_proj: [4,4] proj @ view.
    cam_center: [3] camera position in world space.
    """

    view: jnp.ndarray
    full_proj: jnp.ndarray
    cam_center: jnp.ndarray
    tan_fovx: jnp.ndarray
    tan_fovy: jnp.ndarray
    width: int = flax.struct.field(pytree_node=False)
    height: int = flax.struct.field(pytree_node=False)

    @classmethod
    def create(
        cls,
        R: np.ndarray,
        t: np.ndarray,
        fov_x: float,
        fov_y: float,
        width: int,
        height: int,
        znear: float = ZNEAR,
        zfar: float = ZFAR,
        translate: np.ndarray | None = None,
        scale: float = 1.0,
    ) -> "Camera":
        view = world_to_view(R, t, translate, scale)
        proj = projection_matrix(znear, zfar, fov_x, fov_y)
        full = (proj @ view).astype(np.float32)
        c2w = np.linalg.inv(view.astype(np.float64))
        return cls(
            view=jnp.asarray(view),
            full_proj=jnp.asarray(full),
            cam_center=jnp.asarray(c2w[:3, 3].astype(np.float32)),
            tan_fovx=jnp.float32(math.tan(fov_x / 2.0)),
            tan_fovy=jnp.float32(math.tan(fov_y / 2.0)),
            width=int(width),
            height=int(height),
        )

    @classmethod
    def from_matrices(
        cls,
        view_rowmajor: np.ndarray,
        full_proj_rowmajor: np.ndarray,
        fov_x: float,
        fov_y: float,
        width: int,
        height: int,
    ) -> "Camera":
        """Build from reference-convention (transposed) matrices, as supplied
        by the network viewer (reference: scene/cameras.py:59-70)."""
        view = np.asarray(view_rowmajor, dtype=np.float32).T
        full = np.asarray(full_proj_rowmajor, dtype=np.float32).T
        c2w = np.linalg.inv(view.astype(np.float64))
        return cls(
            view=jnp.asarray(view),
            full_proj=jnp.asarray(full),
            cam_center=jnp.asarray(c2w[:3, 3].astype(np.float32)),
            tan_fovx=jnp.float32(math.tan(fov_x / 2.0)),
            tan_fovy=jnp.float32(math.tan(fov_y / 2.0)),
            width=int(width),
            height=int(height),
        )

    @property
    def focal_x(self) -> jnp.ndarray:
        return self.width / (2.0 * self.tan_fovx)

    @property
    def focal_y(self) -> jnp.ndarray:
        return self.height / (2.0 * self.tan_fovy)


def ndc_to_pixel(ndc: jnp.ndarray, size: jnp.ndarray | float) -> jnp.ndarray:
    """NDC in [-1,1] -> continuous pixel coordinate, matching the CUDA
    rasterizer's ndc2Pix: ((v + 1) * S - 1) / 2."""
    return ((ndc + 1.0) * size - 1.0) * 0.5
