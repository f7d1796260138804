"""Pure-JAX tiled compositor — the portable twin of the Pallas kernels.

Runs the exact chunk_forward math as a lax.scan over the padded chunk
stream, carrying per-tile (T, done, color) state tables. Differentiable by
autodiff (which matches the hand-written Pallas backward by construction —
see chunk_backward's derivation). Used for CPU tests, as the fallback on
non-TPU backends, and as the numerical cross-check for the kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from gsjax.render.binning import Binning
from gsjax.render.common import chunk_forward


def composite_tiles_jax(
    inst_data: jnp.ndarray,
    binning: Binning,
    n_tiles: int,
    tiles_x: int,
    tile_size: int,
    chunk: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Composite the padded instance stream into per-tile buffers.

    Args:
      inst_data: (ROWS, P_PAD) gathered instance fields (see common.py).
      binning: chunk layout; chunks of a tile are consecutive in the stream.
      n_tiles/tiles_x/tile_size/chunk: static geometry.

    Returns:
      tile_color: [n_tiles, PIX, 3] premultiplied color (no background).
      tile_t: [n_tiles, PIX] final transmittance.
    """
    pix = tile_size * tile_size
    nc_total = inst_data.shape[1] // chunk
    cum = jnp.cumsum(binning.n_chunks)
    c_idx = jnp.arange(nc_total, dtype=jnp.int32)
    owner = jnp.searchsorted(cum, c_idx, side="right").astype(jnp.int32)
    owner = jnp.where(c_idx < cum[-1], owner, n_tiles)  # dummy state row

    # Per-tile pixel coordinates, precomputed for all tiles: [n_tiles+1, PIX, 1]
    t_ids = jnp.arange(n_tiles + 1, dtype=jnp.int32)
    tx = t_ids % tiles_x
    ty = t_ids // tiles_x  # dummy row (t == n_tiles) coords are irrelevant
    pidx = jnp.arange(pix, dtype=jnp.int32)
    px_all = (tx[:, None] * tile_size + pidx[None, :] % tile_size).astype(jnp.float32)
    py_all = (ty[:, None] * tile_size + pidx[None, :] // tile_size).astype(jnp.float32)

    t_tab = jnp.ones((n_tiles + 1, pix), jnp.float32)
    d_tab = jnp.zeros((n_tiles + 1, pix), jnp.float32)
    c_tab = jnp.zeros((n_tiles + 1, pix, 3), jnp.float32)

    def step(carry, c):
        t_tab, d_tab, c_tab = carry
        t = owner[c]
        inst = lax.dynamic_slice(
            inst_data, (0, c * chunk), (inst_data.shape[0], chunk)
        )
        t_in = t_tab[t][:, None]
        done_in = d_tab[t][:, None]
        px = px_all[t][:, None]
        py = py_all[t][:, None]
        t_out, done_out, contrib = chunk_forward(inst, px, py, t_in, done_in)
        t_tab = t_tab.at[t].set(t_out[:, 0])
        d_tab = d_tab.at[t].set(done_out[:, 0])
        c_tab = c_tab.at[t].add(contrib)
        return (t_tab, d_tab, c_tab), None

    (t_tab, _, c_tab), _ = lax.scan(
        step, (t_tab, d_tab, c_tab), jnp.arange(nc_total, dtype=jnp.int32)
    )
    return c_tab[:n_tiles], t_tab[:n_tiles]
