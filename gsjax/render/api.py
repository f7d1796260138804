"""Public render API — the gsjax equivalent of the reference's
`render(viewpoint_camera, pc, pipe, bg_color, scaling_modifier,
override_color)` front-end (reference: gaussian_renderer/__init__.py:18-100).

Functional: takes the GaussianParams pytree and a Camera, returns the image
plus the visibility products densification consumes (radii, visibility
filter). Screen-space position gradients — the reference's retained-grad
dummy `means2D` — are realized by differentiating with respect to the
`mean2d_offset` zeros argument.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp

from gsjax.config import RasterConfig
from gsjax.core.cameras import Camera
from gsjax.model import GaussianParams
from gsjax.render.binning import (
    bin_gaussians,
    depth_order,
    num_tiles,
    permute_rows,
)
from gsjax.render.common import untile_image
from gsjax.render.composite import CompositeStatic, composite, pack_fields
from gsjax.render.preprocess import preprocess


@flax.struct.dataclass
class RenderOutput:
    """image: [3,H,W]; radii: [N] int32 (0 = invisible); num_instances /
    num_rows: true (gaussian, tile) pair and (gaussian, tile-row) run counts
    for budget-overflow diagnostics (counts above cfg.max_instances /
    cfg.max_rows mean work was dropped deepest-first)."""

    image: jnp.ndarray
    radii: jnp.ndarray
    num_instances: jnp.ndarray
    num_rows: jnp.ndarray

    @property
    def visibility_filter(self) -> jnp.ndarray:
        return self.radii > 0


def render(
    params: GaussianParams,
    camera: Camera,
    *,
    active_sh_degree: int,
    bg_color: jnp.ndarray,
    cfg: RasterConfig = RasterConfig(),
    scaling_modifier: float = 1.0,
    mean2d_offset: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    override_color: jnp.ndarray | None = None,
    compute_cov3d_outside: bool = False,
    convert_shs_outside: bool = False,
) -> RenderOutput:
    """Render one view.

    Args:
      params: the scene (capacity-padded raw parameters).
      camera: target view.
      active_sh_degree: static current SH degree.
      bg_color: [3] background composited under residual transmittance.
      cfg: static rasterizer configuration.
      scaling_modifier: global scale multiplier (viewer slider).
      mean2d_offset: optional [C,2] zeros whose gradient carries the
        NDC screen-space position gradient (densification statistic).
      alive: [C] bool mask; None = all alive.
      override_color: optional [C,3] color override (reference
        `override_color`).
      compute_cov3d_outside / convert_shs_outside: run covariance / SH->RGB
        through the standalone mirror paths (reference `--compute_cov3D_python`
        / `--convert_SHs_python` parity; numerically identical here since the
        preprocess IS jnp — kept as an A/B hook and for viewer protocol
        support).
    """
    from gsjax.core.transforms import build_covariance
    from gsjax.render.preprocess import sh_to_rgb

    cov3d = None
    if compute_cov3d_outside:
        cov3d = build_covariance(
            params.get_scaling(), scaling_modifier, params.rotation
        )
    rgb_pre = override_color
    if rgb_pre is None and convert_shs_outside:
        rgb_pre = sh_to_rgb(
            params.get_features(), params.xyz, camera.cam_center, active_sh_degree
        )

    proj = preprocess(
        xyz=params.xyz,
        sh=params.get_features(),
        opacity=params.get_opacity(),
        scaling=params.get_scaling(),
        rotation=params.rotation,
        camera=camera,
        active_sh_degree=active_sh_degree,
        scaling_modifier=scaling_modifier,
        mean2d_offset=mean2d_offset,
        alive=alive,
        cov3d_precomp=cov3d,
        rgb_precomp=rgb_pre,
    )

    # ONE fused N-rate depth permute for BOTH consumers: cols 0..8 are the
    # differentiable composite fields (pack_fields layout), cols 9..11 the
    # binning-only ext/qmax (sliced under stop_gradient inside binning).
    # permute_rows' custom VJP maps cotangents back to original order with
    # an inverse-permutation gather instead of an element-rate scatter-add.
    perm = depth_order(proj.depth)
    fields12 = jnp.concatenate(
        [
            pack_fields(proj.mean_pix, proj.conic, proj.rgb, proj.opacity),
            proj.ext,
            proj.qmax[:, None],
        ],
        axis=-1,
    )  # (N, 12)
    f12 = permute_rows(fields12, perm)
    binning = bin_gaussians(
        f12[:, 0:2],
        proj.depth,
        f12[:, 9:11],
        f12[:, 2:5],
        f12[:, 11],
        camera.height,
        camera.width,
        cfg,
        perm=perm,
    )

    tiles_x, tiles_y = num_tiles(camera.height, camera.width, cfg.tw, cfg.th)
    static = CompositeStatic(
        n_tiles=tiles_x * tiles_y,
        tiles_x=tiles_x,
        tile_w=cfg.tw,
        tile_h=cfg.th,
        chunk=cfg.chunk,
        strips=cfg.strips,
        interpret=cfg.interpret,
        fast_fwd=cfg.fast_fwd,
    )
    tile_color, tile_t = composite(f12[:, 0:9], binning, static)
    color, transmittance = untile_image(
        tile_color, tile_t, camera.height, camera.width, tiles_x, tiles_y,
        cfg.tw, cfg.th,
    )
    image = color + transmittance[None, :, :] * bg_color[:, None, None]
    return RenderOutput(
        image=image,
        radii=proj.radius,
        num_instances=binning.num_instances,
        num_rows=binning.num_rows,
    )


def mark_visible(xyz: jnp.ndarray, camera: Camera) -> jnp.ndarray:
    """[N] bool frustum visibility (the rasterizer's markVisible entry,
    SURVEY.md §2.3a; near-plane test matching the in_frustum cull)."""
    from gsjax.render.preprocess import NEAR_CULL_Z, project_points

    _, p_view = project_points(xyz, camera)
    return p_view[:, 2] > NEAR_CULL_Z


def render_oracle(
    params: GaussianParams,
    camera: Camera,
    *,
    active_sh_degree: int,
    bg_color: jnp.ndarray,
    scaling_modifier: float = 1.0,
    mean2d_offset: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
    tile_size: int | None = 16,
) -> jnp.ndarray:
    """Naive O(N*pixels) reference render (tests/debugging)."""
    from gsjax.render.oracle import composite_oracle

    proj = preprocess(
        xyz=params.xyz,
        sh=params.get_features(),
        opacity=params.get_opacity(),
        scaling=params.get_scaling(),
        rotation=params.rotation,
        camera=camera,
        active_sh_degree=active_sh_degree,
        scaling_modifier=scaling_modifier,
        mean2d_offset=mean2d_offset,
        alive=alive,
    )
    return composite_oracle(proj, camera, bg_color, tile_size=tile_size)
