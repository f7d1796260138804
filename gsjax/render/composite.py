"""Differentiable tile compositing with a custom VJP over the Pallas kernels.

The custom_vjp boundary covers gather -> kernel so that the backward can
segment-sum per-instance gradients back to per-Gaussian gradients. Integer
binning products are ordinary (traced) arguments with None cotangents.

On non-TPU backends (or cfg.interpret), the kernels run in Pallas interpret
mode; `composite_tiles_jax` offers the same forward math under plain
autodiff for cross-checks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gsjax.render import common
from gsjax.render.common import build_inst_data
from gsjax.render.pallas_kernels import (
    composite_backward_pallas,
    composite_forward_pallas,
)


class CompositeStatic(NamedTuple):
    """Hashable static geometry for the composite custom_vjp."""

    n_tiles: int
    tiles_x: int
    tile_size: int
    chunk: int
    interpret: bool


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def composite(
    mean_pix: jnp.ndarray,
    conic: jnp.ndarray,
    rgb: jnp.ndarray,
    opacity: jnp.ndarray,
    padded_gid: jnp.ndarray,
    chunk_start: jnp.ndarray,
    n_chunks: jnp.ndarray,
    static: CompositeStatic,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite per-Gaussian splats into per-tile color/transmittance.

    Args:
      mean_pix: [N,2]; conic: [N,3]; rgb: [N,3]; opacity: [N] (all f32, diff).
      padded_gid/chunk_start/n_chunks: binning layout (int32, non-diff).

    Returns:
      tile_color [T, PIX, 3] (premultiplied, background NOT applied),
      tile_t [T, PIX] final transmittance.
    """
    out, _ = _composite_fwd(
        mean_pix, conic, rgb, opacity, padded_gid, chunk_start, n_chunks, static
    )
    return out


def _composite_fwd(mean_pix, conic, rgb, opacity, padded_gid, chunk_start, n_chunks, static):
    inst = build_inst_data(mean_pix, conic, rgb, opacity, padded_gid)
    tile_color, tile_t3 = composite_forward_pallas(
        inst,
        chunk_start,
        n_chunks,
        n_tiles=static.n_tiles,
        tiles_x=static.tiles_x,
        tile_size=static.tile_size,
        chunk=static.chunk,
        interpret=static.interpret,
    )
    tile_t = tile_t3[..., 0]  # kernels carry [T, PIX, 1] for TPU block rules
    residuals = (
        mean_pix,
        conic,
        rgb,
        opacity,
        padded_gid,
        chunk_start,
        n_chunks,
        tile_color,
        tile_t,
    )
    return (tile_color, tile_t), residuals


def _composite_bwd(static, residuals, cotangents):
    (
        mean_pix,
        conic,
        rgb,
        opacity,
        padded_gid,
        chunk_start,
        n_chunks,
        tile_color,
        tile_t,
    ) = residuals
    d_color, d_t = cotangents
    inst = build_inst_data(mean_pix, conic, rgb, opacity, padded_gid)
    inst_grads = composite_backward_pallas(
        inst,
        chunk_start,
        n_chunks,
        tile_color,
        tile_t[..., None],
        d_color,
        d_t[..., None],
        n_tiles=static.n_tiles,
        tiles_x=static.tiles_x,
        tile_size=static.tile_size,
        chunk=static.chunk,
        interpret=static.interpret,
    )
    n = mean_pix.shape[0]
    # [P_PAD, ROWS] -> per-Gaussian sums; sentinel gid == n collects padding
    # and any unwritten tail garbage, then gets sliced off.
    per_gauss = jax.ops.segment_sum(
        inst_grads.T, padded_gid, num_segments=n + 1
    )[:n]
    d_mean_pix = per_gauss[:, common.ROW_MX : common.ROW_MY + 1]
    d_conic = per_gauss[:, common.ROW_CA : common.ROW_CC + 1]
    d_rgb = per_gauss[:, common.ROW_R : common.ROW_B + 1]
    d_opacity = per_gauss[:, common.ROW_OP]
    return (d_mean_pix, d_conic, d_rgb, d_opacity, None, None, None)


composite.defvjp(_composite_fwd, _composite_bwd)
