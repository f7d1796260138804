"""Pure-JAX tiled compositor — the portable twin of the Pallas kernels.

Runs the exact chunk_forward math (including the unpadded-range lane masks)
as a lax.scan over tiles with an inner fori_loop over each tile's chunk
window, mirroring the forward kernel's walk step for step. Forward-only;
used for CPU tests as the numerical cross-check for the kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from gsjax.render.binning import Binning
from gsjax.render.common import chunk_forward
from gsjax.render.pallas_kernels import _chunk_range, _lane_mask


def composite_tiles_jax(
    inst_data: jnp.ndarray,
    binning: Binning,
    n_tiles: int,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite the depth-sorted instance stream into per-tile buffers.

    Args:
      inst_data: (ROWS, P) gathered instance fields (see common.py).
      binning: instance layout (tile_start ranges).
      n_tiles/tiles_x/tile_w/tile_h/chunk: static geometry.

    Returns:
      tile_color: [n_tiles, PIX, 3] premultiplied color (no background).
      tile_t: [n_tiles, PIX] final transmittance.
    """
    pix = tile_w * tile_h
    tile_start = binning.tile_start
    pidx = jnp.arange(pix, dtype=jnp.int32)

    def tile_step(_, t):
        i0 = tile_start[t]
        i1 = tile_start[t + 1]
        # Same range/mask helpers as the kernels — the twin must stay
        # step-for-step identical with them.
        c0, n = _chunk_range(i0, i1, chunk)
        tx = t % tiles_x
        ty = t // tiles_x
        px = (tx * tile_w + pidx % tile_w).astype(jnp.float32)[:, None]
        py = (ty * tile_h + pidx // tile_w).astype(jnp.float32)[:, None]

        def body(j, carry):
            t_in, done_in, acc = carry
            inst = lax.dynamic_slice(
                inst_data, (0, (c0 + j) * chunk), (inst_data.shape[0], chunk)
            )
            mask = _lane_mask(c0, j, i0, i1, chunk)
            t_out, done_out, contrib = chunk_forward(
                inst, px, py, t_in, done_in, mask
            )
            return (t_out, done_out, acc + contrib)

        init = (
            jnp.ones((pix, 1), jnp.float32),
            jnp.zeros((pix, 1), jnp.float32),
            jnp.zeros((pix, 3), jnp.float32),
        )
        t_fin, _, acc = lax.fori_loop(0, n, body, init)
        return None, (acc, t_fin[:, 0])

    _, (tile_color, tile_t) = lax.scan(
        tile_step, None, jnp.arange(n_tiles, dtype=jnp.int32)
    )
    return tile_color, tile_t
