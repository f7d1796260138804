"""Differentiable tile compositing with a custom VJP over the Pallas kernels.

The custom_vjp boundary covers gather -> kernel so that the backward can
reduce per-instance gradients back to per-Gaussian gradients. Integer
binning products are ordinary (traced) arguments with None cotangents.

The per-Gaussian reduction avoids scatter-add (jax.ops.segment_sum costs
~440 ms at 4M instances on TPU): the backward gathers the tile-ordered
instance-gradient stream into GAUSSIAN-MAJOR order through the sort
permutation's inverse (binning.gm_pos), takes a running cumsum, and
differences it at per-Gaussian run boundaries (binning.gm_cum) — ~20x
faster, bandwidth-bound.

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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def composite(
    mean_pix: jnp.ndarray,
    conic: jnp.ndarray,
    rgb: jnp.ndarray,
    opacity: jnp.ndarray,
    binning,
    static: CompositeStatic,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite per-Gaussian splats into per-tile color/transmittance.

    Args:
      mean_pix: [N,2]; conic: [N,3]; rgb: [N,3]; opacity: [N] (all f32, diff).
      binning: Binning layout pytree (int32, non-diff).

    Returns:
      tile_color [T, PIX, 3] (premultiplied, background NOT applied),
      tile_t [T, PIX] final transmittance.
    """
    out, _ = _composite_fwd(mean_pix, conic, rgb, opacity, binning, static)
    return out


def _composite_fwd(mean_pix, conic, rgb, opacity, binning, static):
    inst = build_inst_data(mean_pix, conic, rgb, opacity, binning.padded_gid)
    tile_color, tile_t3 = composite_forward_pallas(
        inst,
        binning.chunk_start,
        binning.n_chunks,
        n_tiles=static.n_tiles,
        tiles_x=static.tiles_x,
        tile_size=static.tile_size,
        chunk=static.chunk,
        interpret=static.interpret,
    )
    tile_t = tile_t3[..., 0]  # kernels carry [T, PIX, 1] for TPU block rules
    # inst is kept as a residual (~P_PAD*64B of HBM) — rebuilding it in the
    # backward would repeat the 4M-instance gather.
    residuals = (inst, binning, tile_color, tile_t)
    return (tile_color, tile_t), residuals


def _composite_bwd(static, residuals, cotangents):
    inst, binning, tile_color, tile_t = residuals
    d_color, d_t = cotangents
    inst_grads = composite_backward_pallas(
        inst,
        binning.chunk_start,
        binning.n_chunks,
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
    P = binning.gm_pos.shape[0]

    # Gaussian-major gather of the tile-ordered grad stream (dropped slots
    # point at p_pad and read back as zero rows), then a segmented sum via
    # cumsum + boundary differences over each Gaussian's contiguous run.
    gm = jnp.take(
        inst_grads.T, binning.gm_pos, axis=0, mode="fill", fill_value=0.0
    )  # (P, ROWS)
    csum = jnp.cumsum(gm, axis=0)
    cum = jnp.minimum(binning.gm_cum, P)  # inclusive ends, clamped to budget
    end = jnp.clip(cum - 1, 0, P - 1)
    start = jnp.concatenate([jnp.zeros(1, jnp.int32), cum[:-1]])
    c_end = jnp.take(csum, end, axis=0)
    c_start = jnp.take(csum, jnp.clip(start - 1, 0, P - 1), axis=0)
    per_gauss = jnp.where(
        (cum > start)[:, None],
        c_end - jnp.where((start > 0)[:, None], c_start, 0.0),
        0.0,
    )  # (N, ROWS)

    d_mean_pix = per_gauss[:, common.ROW_MX : common.ROW_MY + 1]
    d_conic = per_gauss[:, common.ROW_CA : common.ROW_CC + 1]
    d_rgb = per_gauss[:, common.ROW_R : common.ROW_B + 1]
    d_opacity = per_gauss[:, common.ROW_OP]
    return (d_mean_pix, d_conic, d_rgb, d_opacity, None)


composite.defvjp(_composite_fwd, _composite_bwd)
