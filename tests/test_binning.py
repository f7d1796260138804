"""Unit tests for the tile-binning layout (gather expansion, sort, padding).

The mark-cumsum expansion must reproduce exactly what a searchsorted-based
reference produces, including zero-count Gaussians between live ones and
budget overflow."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.config import RasterConfig
from gsjax.render.binning import bin_gaussians, num_tiles, padded_capacity


def reference_layout(mean_pix, depth, radius, h, w, cfg):
    """Brute-force python binning: per tile, depth-sorted gaussian ids."""
    from gsjax.render.oracle import tile_rect

    tiles_x, tiles_y = num_tiles(h, w, cfg.tile_size)
    x0, y0, x1, y1 = (
        np.asarray(v)
        for v in tile_rect(
            jnp.asarray(mean_pix), jnp.asarray(radius), tiles_x, tiles_y,
            cfg.tile_size,
        )
    )
    pairs = []  # (gaussian, tile) in gaussian order
    for g in range(len(radius)):
        for ty in range(y0[g], y1[g]):
            for tx in range(x0[g], x1[g]):
                pairs.append((g, ty * tiles_x + tx))
    pairs = pairs[: cfg.max_instances]
    per_tile: dict[int, list[int]] = {}
    order = sorted(range(len(pairs)), key=lambda i: (pairs[i][1], depth[pairs[i][0]], i))
    for i in order:
        g, t = pairs[i]
        per_tile.setdefault(t, []).append(g)
    return per_tile, len(pairs)


def unpack(binning, n, n_tiles, chunk):
    per_tile = {}
    for t in range(n_tiles):
        s = int(binning.chunk_start[t]) * chunk
        c = int(binning.n_chunks[t]) * chunk
        gids = [int(g) for g in binning.padded_gid[s : s + c] if int(g) != n]
        if gids:
            per_tile[t] = gids
    return per_tile


@pytest.mark.parametrize("seed", [0, 1])
def test_layout_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n, h, w = 40, 64, 80
    cfg = RasterConfig(max_instances=2048, chunk=128, interpret=True)
    mean_pix = rng.uniform(-10, 90, (n, 2)).astype(np.float32)
    depth = rng.uniform(0.5, 9.0, n).astype(np.float32)
    radius = rng.integers(0, 20, n).astype(np.int32)
    radius[::7] = 0  # culled rows interleaved

    binning = bin_gaussians(
        jnp.asarray(mean_pix), jnp.asarray(depth), jnp.asarray(radius), h, w, cfg
    )
    tiles_x, tiles_y = num_tiles(h, w, cfg.tile_size)
    got = unpack(binning, n, tiles_x * tiles_y, cfg.chunk)
    want, total = reference_layout(mean_pix, depth, radius, h, w, cfg)
    assert int(binning.num_instances) == total
    assert got == want


def test_overflow_budget_truncates_but_reports():
    n, h, w = 30, 64, 64
    cfg = RasterConfig(max_instances=128, chunk=128, interpret=True)
    rng = np.random.default_rng(3)
    mean_pix = rng.uniform(0, 64, (n, 2)).astype(np.float32)
    depth = rng.uniform(1, 5, n).astype(np.float32)
    radius = np.full(n, 30, np.int32)  # each touches many tiles

    binning = bin_gaussians(
        jnp.asarray(mean_pix), jnp.asarray(depth), jnp.asarray(radius), h, w, cfg
    )
    assert int(binning.num_instances) > cfg.max_instances  # true count reported
    kept = int(jnp.sum(binning.n_chunks)) * cfg.chunk
    assert kept <= padded_capacity(cfg.max_instances, 16, cfg.chunk)


def test_all_culled_is_empty():
    cfg = RasterConfig(max_instances=256, chunk=128, interpret=True)
    n = 10
    binning = bin_gaussians(
        jnp.zeros((n, 2)), jnp.ones(n), jnp.zeros(n, jnp.int32), 32, 32, cfg
    )
    assert int(binning.num_instances) == 0
    assert int(jnp.sum(binning.n_chunks)) == 0
    assert bool(jnp.all(binning.padded_gid == n))
