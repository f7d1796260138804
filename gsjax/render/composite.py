"""Differentiable tile compositing with a custom VJP over the Pallas kernels.

The custom_vjp boundary covers gather -> kernel so that the backward can
reduce per-instance gradients back to per-Gaussian gradients. All float
inputs are DEPTH-ORDERED (callers permute by binning.perm; the permuting
take's autodiff maps cotangents back to original order). Integer binning
products are ordinary (traced) arguments with None cotangents.

The per-Gaussian reduction avoids both scatter-add (jax.ops.segment_sum
costs ~440 ms at 4M instances on TPU) and instance-rate gathers (~23 ns/row
against a stream-sized table): the backward groups the tile-ordered
instance-gradient stream by owner with ONE stable 1-key sort carrying the
nine gradient rows as riders (~2.5 ns/element/array), then segment-sums the
owner runs with a Pallas kernel gridded over owner blocks (disjoint
instance ranges, one-hot MXU contractions — see
pallas_kernels.segment_sum_pallas).

On non-TPU backends (or cfg.interpret), the kernels run in Pallas interpret
mode; `composite_tiles_jax` (tiled_jax.py) offers the same forward math
under plain autodiff for cross-checks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from gsjax.render import common
from gsjax.render.common import build_inst_data
from gsjax.render.pallas_kernels import (
    composite_backward_pallas,
    composite_forward_pallas,
    segment_sum_pallas,
)


class CompositeStatic(NamedTuple):
    """Hashable static geometry for the composite custom_vjp."""

    n_tiles: int
    tiles_x: int
    tile_w: int
    tile_h: int
    chunk: int
    strips: int
    interpret: bool
    fast_fwd: bool = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def composite(
    fields: jnp.ndarray,
    binning,
    static: CompositeStatic,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite per-Gaussian splats into per-tile color/transmittance.

    Args:
      fields: [N, 9] packed (mean_pix, conic, rgb, opacity) — f32,
        differentiable, in DEPTH ORDER (permuted by binning.perm; see
        pack_fields).
      binning: Binning layout pytree (int32, non-diff).

    Returns:
      tile_color [T, PIX, 3] (premultiplied, background NOT applied),
      tile_t [T, PIX] final transmittance.
    """
    out, _ = _composite_fwd(fields, binning, static)
    return out


def pack_fields(mean_pix, conic, rgb, opacity) -> jnp.ndarray:
    """Pack the differentiable per-Gaussian fields into the [N, 9] layout
    composite consumes (rows as in common.ROW_*)."""
    return jnp.concatenate(
        [mean_pix, conic, rgb, opacity.reshape(-1, 1)], axis=-1
    )


def _composite_fwd(fields, binning, static):
    inst = build_inst_data(fields, binning.sorted_owner)
    tile_color, tile_t3 = composite_forward_pallas(
        inst,
        binning.tile_start,
        n_tiles=static.n_tiles,
        tiles_x=static.tiles_x,
        tile_w=static.tile_w,
        tile_h=static.tile_h,
        chunk=static.chunk,
        strips=static.strips,
        interpret=static.interpret,
        fast=static.fast_fwd,
    )
    tile_t = tile_t3[..., 0]  # kernels carry [T, PIX, 1] for TPU block rules
    # inst is kept as a residual (~P*64B of HBM) — rebuilding it in the
    # backward would repeat the instance-rate gather.
    residuals = (inst, binning, tile_color, tile_t)
    return (tile_color, tile_t), residuals


def _composite_bwd(static, residuals, cotangents):
    if static.fast_fwd:
        raise ValueError(
            "cannot differentiate a fast_fwd render: the backward's exact "
            "replay would be inconsistent with the bf16 forward "
            "(RasterConfig.fast_fwd is inference-only)"
        )
    inst, binning, tile_color, tile_t = residuals
    d_color, d_t = cotangents
    # Per-tile initial suffix A' = sum_ch dC*C_total + dT*T_final, at image
    # rate (see chunk_backward), packed with the color cotangent into the
    # kernel's fused (T, 8, PIX) transposed-rows input (PIX on lanes —
    # pixel-minor (PIX, 1)/(PIX, 3) blocks pad their lane dim to 128).
    suffix0 = jnp.sum(d_color * tile_color, axis=-1) + d_t * tile_t  # (T,PIX)
    n_t, pix = suffix0.shape
    cot = jnp.concatenate(
        [
            jnp.swapaxes(d_color, 1, 2),  # (T, 3, PIX)
            suffix0[:, None, :],
            jnp.zeros((n_t, 4, pix), jnp.float32),
        ],
        axis=1,
    )
    inst_grads = composite_backward_pallas(
        inst,
        binning.tile_start,
        cot,
        n_tiles=static.n_tiles,
        tiles_x=static.tiles_x,
        tile_w=static.tile_w,
        tile_h=static.tile_h,
        chunk=static.chunk,
        strips=static.strips,
        interpret=static.interpret,
    )

    # Group the grad stream by owner: the EXPANSION order is owner-major
    # (gm_start boundaries are its cumulative-offset arithmetic), so invert
    # the tile sort's ridden permutation (one 2-array int sort — here, not
    # in binning, so forward-only rendering never pays it) and regroup with
    # one contiguous-row gather instead of a stable sort carrying all nine
    # f32 gradient rows as riders. Then segment-sum each owner's contiguous
    # run [gm_start[o], gm_start[o+1]).
    pp = binning.sorted_slot.shape[0]
    _, slot_of_inst = lax.sort(
        (binning.sorted_slot, jnp.arange(pp, dtype=jnp.int32)),
        num_keys=1,
        is_stable=True,
    )
    vals = jnp.take(
        inst_grads.T, slot_of_inst, axis=0
    ).T  # (ROWS, P), ROWS already a multiple of 8 (HBM (8,128) tiling)
    n = binning.gm_start.shape[0] - 1
    sums = segment_sum_pallas(
        vals, binning.gm_start, interpret=static.interpret
    )
    return (sums[: common.N_FIELDS, :n].T, None)


composite.defvjp(_composite_fwd, _composite_bwd)
