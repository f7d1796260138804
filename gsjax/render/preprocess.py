"""Per-Gaussian view preprocessing: frustum cull, projection, EWA splat,
conic + screen radius, SH -> RGB.

This is the jnp re-implementation of the CUDA rasterizer's `preprocess`
stage. Its numerical contract is pinned by the reference's Python mirror
paths (`--convert_SHs_python`, `--compute_cov3D_python`,
reference: gaussian_renderer/__init__.py:57-82) and by the EWA algorithm of
the paper: Sigma2D = J W Sigma3D W^T J^T + 0.3 I, conic = Sigma2D^{-1},
radius = ceil(3 * sqrt(max eigenvalue)).

Everything here is plain differentiable JAX — XLA fuses it; the Pallas
kernel only covers the per-pixel compositing. Gradients through the clamped
view-ray (1.3 * tan_fov window) and the color clamp match the CUDA
backward's masking conventions.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
from jax import lax

from gsjax.core.cameras import Camera, ndc_to_pixel
from gsjax.core.sh import eval_sh
from gsjax.core.transforms import build_covariance, cov6_to_mat

# Near-plane cull threshold used by the CUDA rasterizer's in_frustum test.
NEAR_CULL_Z = 0.2
# Low-pass dilation ensuring every splat covers >= ~1px (EWA antialias term).
COV2D_DILATION = 0.3


@flax.struct.dataclass
class Projected:
    """Per-Gaussian screen-space quantities (capacity-sized, masked).

    mean_ndc: [N,2] x/y in NDC; differentiable carrier for the screen-space
      gradient used by densification (the reference realizes this as a dummy
      `means2D` tensor with retain_grad, reference:
      gaussian_renderer/__init__.py:26-30, train.py:116).
    mean_pix: [N,2] continuous pixel coords.
    depth: [N] view-space z.
    conic: [N,3] inverse 2D covariance (a, b, c).
    rgb: [N,3] SH-evaluated color (clamped >= 0).
    opacity: [N] activated opacity.
    radius: [N] int32 screen radius in pixels; 0 == culled/invisible.
    """

    mean_ndc: jnp.ndarray
    mean_pix: jnp.ndarray
    depth: jnp.ndarray
    conic: jnp.ndarray
    rgb: jnp.ndarray
    opacity: jnp.ndarray
    radius: jnp.ndarray


def _mm(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """f32-accurate matmul (TPU truncates f32->bf16 at default precision)."""
    return jnp.matmul(a, b, precision=lax.Precision.HIGHEST)


def project_points(xyz: jnp.ndarray, camera: Camera) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points. Returns (ndc [N,3], view-space point [N,3])."""
    ones = jnp.ones_like(xyz[:, :1])
    hom = jnp.concatenate([xyz, ones], axis=1)  # [N,4]
    p_view = _mm(hom, camera.view.T)  # [N,4]
    p_hom = _mm(hom, camera.full_proj.T)  # [N,4]
    inv_w = 1.0 / (p_hom[:, 3:4] + 1e-7)
    ndc = p_hom[:, :3] * inv_w
    return ndc, p_view[:, :3]


def compute_cov2d(
    cov3d6: jnp.ndarray, p_view: jnp.ndarray, camera: Camera
) -> jnp.ndarray:
    """EWA projection of the 3D covariance to screen space.

    Returns [N,3] = (cov_xx, cov_xy, cov_yy), dilated by +0.3 on the
    diagonal, matching the CUDA computeCov2D contract.
    """
    tz = p_view[:, 2]
    # Guard against division hazards for culled points; callers mask by radius.
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    txtz = jnp.clip(p_view[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    fx = camera.focal_x
    fy = camera.focal_y
    inv_z = 1.0 / tz_safe
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(tz)
    # J: [N,2,3] (third row of the full Jacobian is zero and dropped).
    J = jnp.stack(
        [
            jnp.stack([fx * inv_z, zeros, -fx * tx * inv_z2], axis=-1),
            jnp.stack([zeros, fy * inv_z, -fy * ty * inv_z2], axis=-1),
        ],
        axis=-2,
    )
    W = camera.view[:3, :3]  # world->view rotation
    M = _mm(J, W)  # [N,2,3]
    sigma = cov6_to_mat(cov3d6)  # [N,3,3]
    cov2d = _mm(_mm(M, sigma), jnp.swapaxes(M, -1, -2))  # [N,2,2]
    return jnp.stack(
        [
            cov2d[:, 0, 0] + COV2D_DILATION,
            cov2d[:, 0, 1],
            cov2d[:, 1, 1] + COV2D_DILATION,
        ],
        axis=-1,
    )


def conic_and_radius(cov2d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Invert the 2x2 covariance and bound the splat extent.

    Returns (conic [N,3], radius_f [N] float, valid [N] bool).
    radius = ceil(3 * sqrt(lambda_max)), the 99.7% extent.
    """
    det = cov2d[:, 0] * cov2d[:, 2] - cov2d[:, 1] * cov2d[:, 1]
    valid = det > 0.0
    det_safe = jnp.where(valid, det, 1.0)
    inv_det = 1.0 / det_safe
    conic = jnp.stack(
        [cov2d[:, 2] * inv_det, -cov2d[:, 1] * inv_det, cov2d[:, 0] * inv_det], axis=-1
    )
    mid = 0.5 * (cov2d[:, 0] + cov2d[:, 2])
    disc = jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    lambda_max = mid + disc
    radius = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(lambda_max, 0.0)))
    return conic, radius, valid


def sh_to_rgb(
    sh: jnp.ndarray, xyz: jnp.ndarray, cam_center: jnp.ndarray, active_degree: int
) -> jnp.ndarray:
    """Per-Gaussian view-dependent color, clamped at 0
    (reference: gaussian_renderer/__init__.py:72-78)."""
    dirs = xyz - cam_center[None, :]
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True).clip(1e-12)
    rgb = eval_sh(active_degree, sh, dirs) + 0.5
    return jnp.maximum(rgb, 0.0)


def preprocess(
    xyz: jnp.ndarray,
    sh: jnp.ndarray,
    opacity: jnp.ndarray,
    scaling: jnp.ndarray,
    rotation: jnp.ndarray,
    camera: Camera,
    active_sh_degree: int,
    scaling_modifier: float = 1.0,
    mean2d_offset: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    cov3d_precomp: jnp.ndarray | None = None,
    rgb_precomp: jnp.ndarray | None = None,
) -> Projected:
    """Run the full preprocess stage for one camera.

    Args:
      xyz: [N,3] positions.
      sh: [N,K,3] SH coefficients (dc + rest).
      opacity: [N] or [N,1] ACTIVATED (post-sigmoid) opacity.
      scaling: [N,3] ACTIVATED (post-exp) scales.
      rotation: [N,4] raw quaternions (normalized here).
      camera: target view.
      active_sh_degree: static int, current SH degree.
      scaling_modifier: global scale multiplier.
      mean2d_offset: [N,2] zeros; added in NDC so its gradient equals the
        screen-space gradient the reference deposits on its dummy means2D
        (dL/d ndc = dL/d pix * 0.5*size), used by densification.
      alive: [N] bool mask for capacity slots; dead rows get radius 0.
      cov3d_precomp: optional [N,6] covariance override
        (`--compute_cov3D_python` parity).
      rgb_precomp: optional [N,3] color override (override_color /
        `--convert_SHs_python` parity).
    """
    ndc, p_view = project_points(xyz, camera)
    depth = p_view[:, 2]
    in_front = depth > NEAR_CULL_Z

    if cov3d_precomp is None:
        cov3d6 = build_covariance(scaling, scaling_modifier, rotation)
    else:
        cov3d6 = cov3d_precomp
    cov2d = compute_cov2d(cov3d6, p_view, camera)
    conic, radius_f, det_ok = conic_and_radius(cov2d)

    mean_ndc = ndc[:, :2]
    if mean2d_offset is not None:
        mean_ndc = mean_ndc + mean2d_offset
    size = jnp.array([camera.width, camera.height], dtype=jnp.float32)
    mean_pix = ndc_to_pixel(mean_ndc, size[None, :])

    if rgb_precomp is None:
        rgb = sh_to_rgb(sh, xyz, camera.cam_center, active_sh_degree)
    else:
        rgb = rgb_precomp

    visible = in_front & det_ok
    if alive is not None:
        visible = visible & alive
    radius = jnp.where(visible, radius_f, 0.0)
    # Zero-radius Gaussians touch no tiles; also zero when the splat's
    # bounding square misses the image entirely (cheap reject; the exact
    # tile rect is computed during binning).
    on_screen = (
        (mean_pix[:, 0] + radius >= 0)
        & (mean_pix[:, 0] - radius < camera.width)
        & (mean_pix[:, 1] + radius >= 0)
        & (mean_pix[:, 1] - radius < camera.height)
    )
    radius = jnp.where(on_screen, radius, 0.0)
    radius_i = lax.stop_gradient(radius).astype(jnp.int32)

    opacity = opacity.reshape(-1)

    return Projected(
        mean_ndc=mean_ndc,
        mean_pix=mean_pix,
        depth=depth,
        conic=conic,
        rgb=rgb,
        opacity=opacity,
        radius=radius_i,
    )
