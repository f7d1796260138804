"""Tile-slab-sharded rendering.

Each device on the "tile" mesh axis rasterizes a horizontal slab of tile
rows against the full (replicated) Gaussian set: preprocess is recomputed
per device (cheap, O(N)); binning and the Pallas composite run on the local
slab only, so the expensive per-pixel work is 1/n_tile per device. The
rasterization itself is embarrassingly parallel over pixels once binning is
done (SURVEY.md §5.7).

Slab geometry: the image is padded to whole 16px tile rows; device i owns
tile rows [i*rows_per_dev, (i+1)*rows_per_dev). Splat math is translation
invariant, so the slab is rendered by shifting mean_pix.y by -py0 and
binning against a slab-local tile grid.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

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


def slab_rows(height: int, n_tile: int, tile_h: int) -> int:
    """Tile rows per device; the padded tile grid is split evenly (the last
    device's slab may extend past the true image and is cropped after the
    gather)."""
    tiles_y = -(-height // tile_h)
    return -(-tiles_y // n_tile)


def composite_slab(
    mean_pix: jnp.ndarray,
    conic: jnp.ndarray,
    rgb: jnp.ndarray,
    opacity: jnp.ndarray,
    depth: jnp.ndarray,
    ext: jnp.ndarray,
    qmax: jnp.ndarray,
    *,
    height: int,
    width: int,
    cfg: RasterConfig,
    py0: jnp.ndarray,
    rows: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Bin + composite preprocessed Gaussians into the slab of `rows` tile
    rows starting at pixel row `py0`. Differentiable in (mean_pix, conic,
    rgb, opacity); depth/ext/qmax are binning-only (stop-gradient inside).

    Returns (color [3, rows*ts, W_pad], transmittance [rows*ts, W_pad],
    counts [num_instances, num_rows] int32) — uncropped tile-space slab, no
    background applied.
    """
    tiles_x, _ = num_tiles(height, width, cfg.tw, cfg.th)
    slab_px = rows * cfg.th
    w_pad = tiles_x * cfg.tw

    shift = jnp.stack([jnp.zeros_like(py0), py0])
    mean_local = mean_pix - shift[None, :].astype(jnp.float32)

    # ONE fused N-rate depth permute for binning AND composite fields (see
    # api.render); permute_rows' custom VJP is an inverse-permutation
    # gather — never let autodiff transpose a take() into an element-rate
    # scatter-add on TPU.
    perm = depth_order(depth)
    fields12 = jnp.concatenate(
        [pack_fields(mean_local, conic, rgb, opacity), ext, qmax[:, None]],
        axis=-1,
    )
    f12 = permute_rows(fields12, perm)
    binning = bin_gaussians(
        f12[:, 0:2], depth, f12[:, 9:11], f12[:, 2:5], f12[:, 11],
        slab_px, w_pad, cfg, perm=perm,
    )
    static = CompositeStatic(
        n_tiles=tiles_x * rows,
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
        tile_color, tile_t, slab_px, w_pad, tiles_x, rows, cfg.tw, cfg.th
    )
    counts = jnp.stack([binning.num_instances, binning.num_rows])
    return color, transmittance, counts


def render_slab(
    params: GaussianParams,
    camera: Camera,
    *,
    active_sh_degree: int,
    cfg: RasterConfig,
    py0: jnp.ndarray,
    rows: int,
    scaling_modifier: float = 1.0,
    mean2d_offset: jnp.ndarray | None = None,
    alive: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Rasterize the slab of `rows` tile rows starting at pixel row `py0`.

    Returns (color [3, rows*ts, W_pad], transmittance [rows*ts, W_pad],
    radii [N] int32, counts ([num_instances, num_rows] int32)) — uncropped
    tile-space slab, no background applied (composite bg after the
    cross-device gather).
    """
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
    color, transmittance, counts = composite_slab(
        proj.mean_pix, proj.conic, proj.rgb, proj.opacity,
        proj.depth, proj.ext, proj.qmax,
        height=camera.height, width=camera.width, cfg=cfg, py0=py0, rows=rows,
    )
    return color, transmittance, proj.radius, counts


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "active_sh_degree", "cfg", "scaling_modifier"),
)
def render_sharded(
    params: GaussianParams,
    camera: Camera,
    *,
    mesh: Mesh,
    active_sh_degree: int,
    bg_color: jnp.ndarray,
    cfg: RasterConfig = RasterConfig(),
    scaling_modifier: float = 1.0,
    alive: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Render one view with tiles sharded over the mesh's "tile" axis.

    Gaussians are replicated; each device rasterizes its slab; slabs are
    gathered and cropped to [3, H, W]. Works under any "data" axis size (the
    computation is replicated over "data").
    """
    n_tile = mesh.shape["tile"]
    ts = cfg.th
    rows = slab_rows(camera.height, n_tile, ts)
    if alive is None:
        alive = jnp.ones(params.capacity, dtype=bool)

    def body(params, camera, alive, bg):
        py0 = (lax.axis_index("tile") * rows * ts).astype(jnp.float32)
        color, t, _, _ = render_slab(
            params,
            camera,
            active_sh_degree=active_sh_degree,
            cfg=cfg,
            py0=py0,
            rows=rows,
            scaling_modifier=scaling_modifier,
            alive=alive,
        )
        full_c = lax.all_gather(color, "tile", axis=1, tiled=True)
        full_t = lax.all_gather(t, "tile", axis=0, tiled=True)
        img = full_c[:, : camera.height, : camera.width] + full_t[
            None, : camera.height, : camera.width
        ] * bg[:, None, None]
        return img

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    return fn(params, camera, alive, bg_color)
