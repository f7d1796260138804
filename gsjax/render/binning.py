"""Tile binning: expand (Gaussian, tile) instance pairs, depth-sort them per
tile, and lay them out in chunk-aligned per-tile ranges for the compositor.

TPU-native re-design of the CUDA rasterizer's duplicateWithKeys + radix-sort
+ identifyTileRanges stages. Differences driven by XLA static shapes:

* Fixed instance budget `max_instances` (overflow counted and reported, not
  silent — callers can log and grow the budget).
* Instance expansion is GATHER-based: slot p finds its owner Gaussian with a
  searchsorted over the cumulative tile-count array — no dynamic scatter, no
  per-Gaussian inner loop, O(P log N) fully vectorized.
* One `lax.sort` over (tile, depth) (stable, matching the CUDA radix sort's
  stability).
* Per-tile ranges are PADDED to a multiple of `chunk` and instances scattered
  into the padded layout, so each `chunk`-sized block of the instance stream
  belongs to exactly one tile: the Pallas kernel's DMAs are aligned, and the
  backward kernel's per-instance gradient writes never race across tiles.

Everything here is integer bookkeeping under stop_gradient; gradients flow
through the separately-gathered float instance data.
"""

from __future__ import annotations

import flax.struct
import jax.numpy as jnp
from jax import lax

from gsjax.config import RasterConfig
from gsjax.render.oracle import tile_rect


@flax.struct.dataclass
class Binning:
    """Instance layout for one frame.

    padded_gid: [P_PAD] int32 Gaussian index per padded instance slot;
      `capacity` (== N, one past the last real row) marks padding.
    chunk_start: [T] int32 first chunk index of each tile's range.
    n_chunks: [T] int32 chunks owned by each tile.
    num_instances: [] int32 true (unpadded, unclamped) pair count — if this
      exceeds max_instances the frame overflowed the budget.
    """

    padded_gid: jnp.ndarray
    chunk_start: jnp.ndarray
    n_chunks: jnp.ndarray
    num_instances: jnp.ndarray
    # gm_pos: [P] int32 padded-stream position of each GAUSSIAN-MAJOR
    # instance slot p (p_pad for dropped slots) — the inverse of the
    # tile-sort permutation. The backward gathers per-instance gradients
    # through it into contiguous per-Gaussian runs and reduces them with a
    # cumsum + boundary differences (a scatter-add segment_sum costs ~20x
    # more on TPU). gm_cum: [N] int32 inclusive cumsum of per-Gaussian
    # instance counts (run boundaries; clamp to max_instances at use).
    gm_pos: jnp.ndarray
    gm_cum: jnp.ndarray


def num_tiles(height: int, width: int, tile_size: int) -> tuple[int, int]:
    return -(-width // tile_size), -(-height // tile_size)


def padded_capacity(max_instances: int, n_tiles: int, chunk: int) -> int:
    """Static instance-stream capacity after per-tile chunk alignment."""
    return max_instances + n_tiles * (chunk - 1)


def bin_gaussians(
    mean_pix: jnp.ndarray,
    depth: jnp.ndarray,
    radius: jnp.ndarray,
    height: int,
    width: int,
    cfg: RasterConfig,
) -> Binning:
    """Build the chunk-aligned, depth-sorted instance layout.

    Args:
      mean_pix: [N,2] continuous pixel centers (gradients stopped here).
      depth: [N] view-space z (sort key).
      radius: [N] int32 pixel radius; 0 = skip.
      height/width: image dims (static).
      cfg: static rasterizer config.
    """
    mean_pix = lax.stop_gradient(mean_pix)
    depth = lax.stop_gradient(depth)
    n = radius.shape[0]
    tiles_x, tiles_y = num_tiles(height, width, cfg.tile_size)
    n_tiles = tiles_x * tiles_y
    P = cfg.max_instances
    chunk = cfg.chunk

    x0, y0, x1, y1 = tile_rect(mean_pix, radius, tiles_x, tiles_y, cfg.tile_size)
    rect_w = x1 - x0
    counts = rect_w * (y1 - y0)  # [N] int32

    cum = jnp.cumsum(counts)  # inclusive
    start = cum - counts  # exclusive
    total = cum[-1]

    # --- instance expansion: boundary-mark cumsum ---------------------------
    # owner[p] = the Gaussian whose [start, start+count) range contains slot
    # p. searchsorted(cum, p) would cost O(P log N) sequential gather passes
    # (~600 ms at 4M pairs on TPU); instead scatter a mark at every range
    # start and take a running sum — among equal starts (zero-count rows)
    # the true owner has the max index, which the cumsum yields.
    p = jnp.arange(P, dtype=jnp.int32)
    marks = jnp.zeros(P, jnp.int32).at[start].add(1, mode="drop")
    owner = jnp.cumsum(marks) - 1  # [P]
    valid = p < jnp.minimum(total, P)
    g = jnp.clip(owner, 0, n - 1)

    # One packed row-gather for all per-Gaussian fields consumed at
    # instance rate (separate fancy-index gathers cost ~30 ms each at 4M).
    # int32 values here are < 2^24, exact in f32.
    table = jnp.stack(
        [
            start.astype(jnp.float32),
            x0.astype(jnp.float32),
            y0.astype(jnp.float32),
            jnp.maximum(rect_w, 1).astype(jnp.float32),
            depth,
        ],
        axis=-1,
    )  # [N, 5]
    tf = jnp.take(table, g, axis=0)  # [P, 5]
    local = p - tf[:, 0].astype(jnp.int32)
    rw = tf[:, 3].astype(jnp.int32)
    tx = tf[:, 1].astype(jnp.int32) + local % rw
    ty = tf[:, 2].astype(jnp.int32) + local // rw
    tile = ty * tiles_x + tx
    tile = jnp.where(valid, tile, n_tiles)  # sentinel sorts last
    d = jnp.where(valid, tf[:, 4], jnp.inf)

    # --- per-tile depth order (stable sort, like the CUDA radix sort) -------
    # p rides along so the sort permutation can be inverted for the
    # backward's gaussian-major gradient gather (gm_pos below).
    sorted_tile, _, sorted_gid, sorted_pid = lax.sort(
        (tile, d, g, p), num_keys=2, is_stable=True
    )

    # --- chunk-aligned padded layout -----------------------------------------
    # Start of each tile's run inside the sorted stream; counts are run
    # lengths (no scatter-add histogram needed).
    sorted_start = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    tile_counts = sorted_start[1:] - sorted_start[:-1]
    sorted_start = sorted_start[:n_tiles]
    padded_counts = -(-tile_counts // chunk) * chunk
    padded_start = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(padded_counts)[:-1]]
    )

    p_pad = padded_capacity(P, n_tiles, chunk)
    i = jnp.arange(P, dtype=jnp.int32)
    st = jnp.clip(sorted_tile, 0, n_tiles - 1)
    rank = i - sorted_start[st]
    dst = padded_start[st] + rank
    dst = jnp.where(sorted_tile < n_tiles, dst, p_pad)  # drop sentinels
    padded_gid = jnp.full(p_pad, n, dtype=jnp.int32).at[dst].set(
        sorted_gid, mode="drop"
    )
    gm_pos = jnp.zeros(P, dtype=jnp.int32).at[sorted_pid].set(dst)

    return Binning(
        padded_gid=padded_gid,
        chunk_start=(padded_start // chunk).astype(jnp.int32),
        n_chunks=(padded_counts // chunk).astype(jnp.int32),
        num_instances=total,
        gm_pos=gm_pos,
        gm_cum=cum,
    )
