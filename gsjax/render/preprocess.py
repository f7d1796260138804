"""Per-Gaussian view preprocessing: frustum cull, projection, EWA splat,
conic + screen extents, SH -> RGB.

This is the jnp re-implementation of the CUDA rasterizer's `preprocess`
stage. Its numerical contract is pinned by the reference's Python mirror
paths (`--convert_SHs_python`, `--compute_cov3D_python`,
reference: gaussian_renderer/__init__.py:57-82) and by the EWA algorithm of
the paper: Sigma2D = J W Sigma3D W^T J^T + 0.3 I, conic = Sigma2D^{-1},
radius = ceil(3 * sqrt(max eigenvalue)).

TPU notes: every small-matrix product (hom point x 4x4, J W Sigma W^T J^T,
R(q) diag(s^2) R(q)^T, SH basis contraction) is written as SCALAR-EXPANDED
elementwise ops over [N] vectors rather than batched tiny matmuls/einsums —
XLA fuses the whole stage into a few VPU passes in exact f32, where batched
(N,2,3)x(N,3,3) dots at HIGHEST precision cost ~50 ms at 500k on a v5e chip.

Beyond the reference's circular 3-sigma bound, preprocess also emits a per-
axis screen-space extent `ext` and the alpha-threshold level `qmax`:
  qmax = 2 ln(255 * opacity)         (alpha >= 1/255  <=>  d^T conic d <= qmax)
  ext  = min(sqrt(qmax * Sigma2D_diag), 3 sigma_max)   per axis
Binning uses the tight rect [mean +- ext]; because any pixel with
alpha >= 1/255 inside the reference's 3-sigma rect satisfies both bounds,
the tight rect drops only (gaussian, tile) pairs the compositor's 1/255
skip mask would zero anyway — rendered output (and gradients) are identical
to the reference rect, instance count is typically 2-4x smaller.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
from jax import lax

from gsjax.core.cameras import Camera, ndc_to_pixel
from gsjax.core.sh import eval_sh

# Near-plane cull threshold used by the CUDA rasterizer's in_frustum test.
NEAR_CULL_Z = 0.2
# Low-pass dilation ensuring every splat covers >= ~1px (EWA antialias term).
COV2D_DILATION = 0.3
# Compositor skip threshold (must match common.ALPHA_SKIP).
_ALPHA_SKIP = 1.0 / 255.0


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
    radius: [N] int32 screen radius in pixels (ceil 3 sigma_max);
      0 == culled/invisible. The reference's densify statistic + visibility
      filter semantics.
    ext: [N,2] tight per-axis pixel extents (stop-grad; 0 = no coverage).
    qmax: [N] alpha-threshold level 2 ln(255 op) (stop-grad).
    """

    mean_ndc: jnp.ndarray
    mean_pix: jnp.ndarray
    depth: jnp.ndarray
    conic: jnp.ndarray
    rgb: jnp.ndarray
    opacity: jnp.ndarray
    radius: jnp.ndarray
    ext: jnp.ndarray
    qmax: jnp.ndarray


def project_points(xyz: jnp.ndarray, camera: Camera) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points. Returns (ndc [N,3], view-space point [N,3]).

    Row-expanded 4x4 transforms: exact f32 adds/muls on the VPU (a (N,4) x
    (4,4) MXU dot would truncate to bf16 or pay the 6-pass HIGHEST path).
    """
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]

    def apply4(m):
        rows = [m[i, 0] * x + m[i, 1] * y + m[i, 2] * z + m[i, 3] for i in range(4)]
        return rows

    vx, vy, vz, _ = apply4(camera.view)
    hx, hy, hz, hw = apply4(camera.full_proj)
    inv_w = 1.0 / (hw + 1e-7)
    ndc = jnp.stack([hx * inv_w, hy * inv_w, hz * inv_w], axis=-1)
    p_view = jnp.stack([vx, vy, vz], axis=-1)
    return ndc, p_view


def compute_cov3d_elems(
    scaling: jnp.ndarray, scaling_modifier, rotation: jnp.ndarray
) -> tuple[jnp.ndarray, ...]:
    """Sigma3D = R diag(s^2) R^T as six [N] vectors (xx, xy, xz, yy, yz, zz).

    Scalar expansion of the reference's L L^T construction
    (reference: scene/gaussian_model.py:26-31, utils/general_utils.py:78-110).
    """
    qn = rotation / jnp.sqrt(
        jnp.sum(rotation * rotation, axis=-1, keepdims=True)
    )
    r, x, y, z = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    s = scaling * scaling_modifier
    s0, s1, s2 = s[:, 0] ** 2, s[:, 1] ** 2, s[:, 2] ** 2

    # Rotation matrix entries (reference: utils/general_utils.py:85-97).
    r00 = 1.0 - 2.0 * (y * y + z * z)
    r01 = 2.0 * (x * y - r * z)
    r02 = 2.0 * (x * z + r * y)
    r10 = 2.0 * (x * y + r * z)
    r11 = 1.0 - 2.0 * (x * x + z * z)
    r12 = 2.0 * (y * z - r * x)
    r20 = 2.0 * (x * z - r * y)
    r21 = 2.0 * (y * z + r * x)
    r22 = 1.0 - 2.0 * (x * x + y * y)

    # Sigma_ij = sum_k R_ik R_jk s_k^2.
    c_xx = r00 * r00 * s0 + r01 * r01 * s1 + r02 * r02 * s2
    c_xy = r00 * r10 * s0 + r01 * r11 * s1 + r02 * r12 * s2
    c_xz = r00 * r20 * s0 + r01 * r21 * s1 + r02 * r22 * s2
    c_yy = r10 * r10 * s0 + r11 * r11 * s1 + r12 * r12 * s2
    c_yz = r10 * r20 * s0 + r11 * r21 * s1 + r12 * r22 * s2
    c_zz = r20 * r20 * s0 + r21 * r21 * s1 + r22 * r22 * s2
    return c_xx, c_xy, c_xz, c_yy, c_yz, c_zz


def compute_cov2d(
    cov3d6: jnp.ndarray, p_view: jnp.ndarray, camera: Camera
) -> jnp.ndarray:
    """EWA projection of the 3D covariance to screen space.

    Returns [N,3] = (cov_xx, cov_xy, cov_yy), dilated by +0.3 on the
    diagonal, matching the CUDA computeCov2D contract. Scalar-expanded
    J W Sigma W^T J^T (J's third row is zero and dropped).
    """
    elems = tuple(cov3d6[:, i] for i in range(6))
    return _cov2d_from_elems(elems, p_view, camera)


def _cov2d_from_elems(
    elems: tuple[jnp.ndarray, ...], p_view: jnp.ndarray, camera: Camera
) -> jnp.ndarray:
    c_xx, c_xy, c_xz, c_yy, c_yz, c_zz = elems
    tz = p_view[:, 2]
    tz_safe = jnp.where(jnp.abs(tz) < 1e-6, 1e-6, tz)
    limx = 1.3 * camera.tan_fovx
    limy = 1.3 * camera.tan_fovy
    txtz = jnp.clip(p_view[:, 0] / tz_safe, -limx, limx)
    tytz = jnp.clip(p_view[:, 1] / tz_safe, -limy, limy)
    tx = txtz * tz_safe
    ty = tytz * tz_safe

    inv_z = 1.0 / tz_safe
    a0 = camera.focal_x * inv_z
    a2 = -camera.focal_x * tx * inv_z * inv_z
    b1 = camera.focal_y * inv_z
    b2 = -camera.focal_y * ty * inv_z * inv_z

    # M = J @ W: row0 = a0 * W0 + a2 * W2, row1 = b1 * W1 + b2 * W2 with
    # W rows [3] frame constants.
    W = camera.view[:3, :3]
    m00 = a0 * W[0, 0] + a2 * W[2, 0]
    m01 = a0 * W[0, 1] + a2 * W[2, 1]
    m02 = a0 * W[0, 2] + a2 * W[2, 2]
    m10 = b1 * W[1, 0] + b2 * W[2, 0]
    m11 = b1 * W[1, 1] + b2 * W[2, 1]
    m12 = b1 * W[1, 2] + b2 * W[2, 2]

    # Sigma @ M^T columns, then M @ (that): expand symmetric Sigma rows.
    def sig_dot(mx, my, mz):
        return (
            c_xx * mx + c_xy * my + c_xz * mz,
            c_xy * mx + c_yy * my + c_yz * mz,
            c_xz * mx + c_yz * my + c_zz * mz,
        )

    s0x, s0y, s0z = sig_dot(m00, m01, m02)
    s1x, s1y, s1z = sig_dot(m10, m11, m12)
    v_xx = m00 * s0x + m01 * s0y + m02 * s0z + COV2D_DILATION
    v_xy = m00 * s1x + m01 * s1y + m02 * s1z
    v_yy = m10 * s1x + m11 * s1y + m12 * s1z + COV2D_DILATION
    return jnp.stack([v_xx, v_xy, v_yy], axis=-1)


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
        cov3d_elems = compute_cov3d_elems(scaling, scaling_modifier, rotation)
    else:
        cov3d_elems = tuple(cov3d_precomp[:, i] for i in range(6))
    cov2d = _cov2d_from_elems(cov3d_elems, p_view, camera)
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

    # Tight per-axis extents (stop-grad; binning bookkeeping only). The
    # sublevel set {d : d^T conic d <= qmax} has max |dx| = sqrt(qmax *
    # Sigma_xx); intersecting with the reference's 3-sigma square keeps the
    # instance set a SUBSET of the reference rect while covering every pixel
    # the compositor's 1/255 skip would keep.
    op_sg = lax.stop_gradient(opacity)
    qmax = 2.0 * jnp.log(jnp.maximum(255.0 * op_sg, 1e-6))
    qmax = jnp.maximum(qmax, 0.0)  # <=0 means no pixel can pass the skip
    cov_sg = lax.stop_gradient(cov2d)
    ex = jnp.sqrt(jnp.maximum(qmax * cov_sg[:, 0], 0.0))
    ey = jnp.sqrt(jnp.maximum(qmax * cov_sg[:, 2], 0.0))
    covered = (op_sg >= _ALPHA_SKIP) & (radius > 0.0)
    ext = jnp.stack(
        [
            jnp.where(covered, jnp.minimum(ex, radius), 0.0),
            jnp.where(covered, jnp.minimum(ey, radius), 0.0),
        ],
        axis=-1,
    )

    return Projected(
        mean_ndc=mean_ndc,
        mean_pix=mean_pix,
        depth=depth,
        conic=conic,
        rgb=rgb,
        opacity=opacity,
        radius=radius_i,
        ext=ext,
        qmax=lax.stop_gradient(qmax),
    )
