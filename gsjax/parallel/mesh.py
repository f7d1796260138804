"""Device mesh construction for gsjax.

Axes:
  data — camera-level data parallelism (each group trains on its own view;
         parameter gradients are averaged with pmean over this axis).
  tile — pixel/tile-slab parallelism WITHIN one view (each device rasterizes
         a horizontal slab of tile rows; per-Gaussian gradients are summed
         with psum over this axis).

On a pod slice, lay "tile" over the fastest (ICI-adjacent) axis: the psum of
Gaussian gradients is the bandwidth-heavy collective.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def mesh_shape_for(n_devices: int, max_tile: int = 4) -> tuple[int, int]:
    """Pick a (data, tile) factorization of n_devices.

    Prefers the largest tile factor <= max_tile that divides n_devices —
    tile-slab parallelism cuts per-step latency; the remainder goes to data
    parallelism for throughput.
    """
    tile = 1
    for cand in range(min(max_tile, n_devices), 0, -1):
        if n_devices % cand == 0:
            tile = cand
            break
    return n_devices // tile, tile


def make_mesh(
    devices: list | None = None,
    data: int | None = None,
    tile: int | None = None,
) -> Mesh:
    """Build a ("data", "tile") mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None and tile is None:
        data, tile = mesh_shape_for(n)
    elif data is None:
        data = n // tile
    elif tile is None:
        tile = n // data
    if data * tile != n:
        raise ValueError(f"mesh {data}x{tile} != {n} devices")
    arr = np.asarray(devices).reshape(data, tile)
    return Mesh(arr, axis_names=("data", "tile"))
