"""Unit tests for the tile-binning layout (depth-major expansion, tile
grouping, exact cull, gaussian-major reduction order).

The mark-cumsum expansion + stable tile sort must reproduce exactly what a
brute-force python binning produces, including zero-count Gaussians between
live ones and budget overflow (slots assigned depth-major; overflow drops
the deepest instances)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.config import RasterConfig
from gsjax.render.binning import (
    bin_gaussians,
    num_tiles,
    tile_rect_ext,
    _qmin_over_rect,
)

BIG_Q = 1e9  # disables the exact cull (qmin <= qmax always)
TINY_CONIC = np.array([1e-9, 0.0, 1e-9], np.float32)


def reference_layout(mean_pix, depth, ext, h, w, cfg):
    """Brute-force python binning: per tile, depth-ordered ORIGINAL ids."""
    tiles_x, tiles_y = num_tiles(h, w, cfg.tile_size)
    x0, y0, x1, y1 = (
        np.asarray(v)
        for v in tile_rect_ext(
            jnp.asarray(mean_pix), jnp.asarray(ext), tiles_x, tiles_y, cfg.tile_size
        )
    )
    n = len(depth)
    order = sorted(range(n), key=lambda g: (depth[g], g))  # stable depth sort
    pairs = []  # (gaussian, tile) in depth-major expansion order
    for g in order:
        for ty in range(y0[g], y1[g]):
            for tx in range(x0[g], x1[g]):
                pairs.append((g, ty * tiles_x + tx))
    total = len(pairs)
    pairs = pairs[: cfg.max_instances]
    per_tile: dict[int, list[int]] = {}
    for g, t in pairs:  # expansion order IS depth order; grouping is stable
        per_tile.setdefault(t, []).append(g)
    return per_tile, total


def unpack(binning, n, n_tiles):
    """Per-tile ORIGINAL gaussian ids from the Binning layout."""
    perm = np.asarray(binning.perm)
    owner = np.asarray(binning.sorted_owner)
    ts = np.asarray(binning.tile_start)
    per_tile = {}
    for t in range(n_tiles):
        ids = [int(perm[o]) for o in owner[ts[t] : ts[t + 1]] if o < n]
        if ids:
            per_tile[t] = ids
    return per_tile


def _bin(mean_pix, depth, ext, h, w, cfg, conic=None, qmax=None):
    n = len(depth)
    conic = np.tile(TINY_CONIC, (n, 1)) if conic is None else conic
    qmax = np.full(n, BIG_Q, np.float32) if qmax is None else qmax
    return bin_gaussians(
        jnp.asarray(mean_pix),
        jnp.asarray(depth),
        jnp.asarray(ext),
        jnp.asarray(conic),
        jnp.asarray(qmax),
        h,
        w,
        cfg,
    )


@pytest.mark.parametrize("seed", [0, 1])
def test_layout_matches_bruteforce(seed):
    rng = np.random.default_rng(seed)
    n, h, w = 40, 64, 80
    cfg = RasterConfig(max_instances=2048, chunk=128, interpret=True)
    mean_pix = rng.uniform(-10, 90, (n, 2)).astype(np.float32)
    depth = rng.uniform(0.5, 9.0, n).astype(np.float32)
    ext = rng.uniform(0, 20, (n, 2)).astype(np.float32)
    ext[::7] = 0.0  # culled rows interleaved

    binning = _bin(mean_pix, depth, ext, h, w, cfg)
    tiles_x, tiles_y = num_tiles(h, w, cfg.tile_size)
    got = unpack(binning, n, tiles_x * tiles_y)
    want, total = reference_layout(mean_pix, depth, ext, h, w, cfg)
    assert int(binning.num_instances) == total
    assert got == want
    # Exactness invariant: with no overflow and no exact-cull (BIG_Q), the
    # reported count equals the live stream length — the budget is spent
    # entirely on real instances.
    assert int(np.asarray(binning.tile_start)[-1]) == total


def test_gm_runs_group_each_gaussian():
    rng = np.random.default_rng(2)
    n, h, w = 25, 64, 64
    cfg = RasterConfig(max_instances=1024, chunk=128, interpret=True)
    mean_pix = rng.uniform(0, 64, (n, 2)).astype(np.float32)
    depth = rng.uniform(1, 5, n).astype(np.float32)
    ext = rng.uniform(0, 18, (n, 2)).astype(np.float32)

    binning = _bin(mean_pix, depth, ext, h, w, cfg)
    owner = np.asarray(binning.sorted_owner)
    gm_start = np.asarray(binning.gm_start)
    live_end = int(np.asarray(binning.tile_start)[-1])
    # gm_start[o+1] - gm_start[o] must equal owner o's live instance count:
    # sorting the stream by owner groups exactly those runs.
    counts = np.bincount(owner[owner < n], minlength=n)
    np.testing.assert_array_equal(gm_start[1:] - gm_start[:-1], counts)
    assert gm_start[0] == 0
    assert gm_start[n] == live_end  # dead slots group past the live runs


def test_exact_cull_drops_noncontributing_tiles():
    # A thin diagonal splat: the tight rect covers a square of tiles but the
    # ellipse (alpha >= 1/255 region) only crosses the diagonal ones.
    cfg = RasterConfig(max_instances=1024, chunk=128, interpret=True)
    h = w = 128
    mean_pix = np.array([[64.0, 64.0]], np.float32)
    depth = np.array([1.0], np.float32)
    ext = np.array([[60.0, 60.0]], np.float32)
    # conic of a covariance elongated along y=x: lambda_big along (1,1).
    conic = np.array([[0.3, -0.29, 0.3]], np.float32)  # inverse cov, thin
    qmax = np.array([2.0 * np.log(255.0)], np.float32)

    loose = _bin(mean_pix, depth, ext, h, w, cfg)
    tight = _bin(mean_pix, depth, ext, h, w, cfg, conic=conic, qmax=qmax)
    live_loose = int(np.asarray(loose.tile_start)[-1])
    live_tight = int(np.asarray(tight.tile_start)[-1])
    assert live_loose == 64  # full 8x8 tile square
    assert 0 < live_tight < live_loose
    # Validate against the exact qmin test per tile (the production path
    # inflates qmax by CULL_QMAX_MARGIN against f32 det cancellation).
    from gsjax.render.binning import CULL_QMAX_MARGIN

    ts = cfg.tile_size
    expect = 0
    for ty in range(8):
        for tx in range(8):
            dx0 = tx * ts - 64.0
            dy0 = ty * ts - 64.0
            qmin = float(
                _qmin_over_rect(
                    jnp.float32(dx0), jnp.float32(dx0 + ts - 1.0),
                    jnp.float32(dy0), jnp.float32(dy0 + ts - 1.0),
                    jnp.float32(conic[0, 0]), jnp.float32(conic[0, 1]),
                    jnp.float32(conic[0, 2]),
                )
            )
            if qmin <= qmax[0] * CULL_QMAX_MARGIN + 1e-6:
                expect += 1
    assert live_tight == expect


def test_overflow_budget_truncates_but_reports():
    n, h, w = 30, 64, 64
    cfg = RasterConfig(max_instances=128, chunk=128, interpret=True)
    rng = np.random.default_rng(3)
    mean_pix = rng.uniform(0, 64, (n, 2)).astype(np.float32)
    depth = rng.uniform(1, 5, n).astype(np.float32)
    ext = np.full((n, 2), 30.0, np.float32)  # each touches many tiles

    binning = _bin(mean_pix, depth, ext, h, w, cfg)
    assert int(binning.num_instances) > cfg.max_instances  # true count reported
    assert int(np.asarray(binning.tile_start)[-1]) <= cfg.max_instances
    # The kept instances are the shallowest ones (depth-major expansion).
    want, _ = reference_layout(mean_pix, depth, ext, h, w, cfg)
    tiles_x, tiles_y = num_tiles(h, w, cfg.tile_size)
    got = unpack(binning, n, tiles_x * tiles_y)
    assert got == want


def test_all_culled_is_empty():
    cfg = RasterConfig(max_instances=256, chunk=128, interpret=True)
    n = 10
    binning = _bin(
        np.zeros((n, 2), np.float32),
        np.ones(n, np.float32),
        np.zeros((n, 2), np.float32),
        32,
        32,
        cfg,
    )
    assert int(binning.num_instances) == 0
    assert int(np.asarray(binning.tile_start)[-1]) == 0
    assert bool(jnp.all(binning.sorted_owner == n))


def test_permute_rows_grad_is_exact_inverse_gather():
    # permute_rows == take(x, perm) and its VJP must equal the generic
    # scatter-add transpose exactly (a permutation's cotangent map is the
    # inverse permutation).
    from gsjax.render.binning import permute_rows

    rng = np.random.default_rng(3)
    n, k = 257, 9
    x = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))
    perm = jnp.asarray(rng.permutation(n).astype(np.int32))
    ct = jnp.asarray(rng.normal(size=(n, k)).astype(np.float32))

    np.testing.assert_array_equal(
        np.asarray(permute_rows(x, perm)), np.asarray(jnp.take(x, perm, axis=0))
    )
    _, vjp_custom = jax.vjp(lambda v: permute_rows(v, perm), x)
    _, vjp_generic = jax.vjp(lambda v: jnp.take(v, perm, axis=0), x)
    np.testing.assert_array_equal(
        np.asarray(vjp_custom(ct)[0]), np.asarray(vjp_generic(ct)[0])
    )


@pytest.mark.parametrize("seed", [0, 5])
def test_packed_paths_match_fallback(seed):
    """The uint32 packed expansion/sort (auto on every sub-2^32-bit shape)
    must produce the exact layout of the gather/3-array-sort fallback —
    the fallback is unreachable at test scales, so pin it explicitly."""
    rng = np.random.default_rng(seed)
    n, h, w = 120, 96, 128
    cfg = RasterConfig(max_instances=4096, max_rows=2048, interpret=True)
    mean_pix = rng.uniform(-20, 140, (n, 2)).astype(np.float32)
    depth = rng.uniform(0.5, 9.0, n).astype(np.float32)
    ext = rng.uniform(0, 25, (n, 2)).astype(np.float32)
    ext[::5] = 0.0
    conic = np.tile(TINY_CONIC, (n, 1))
    qmax = np.full(n, BIG_Q, np.float32)
    args = (
        jnp.asarray(mean_pix), jnp.asarray(depth), jnp.asarray(ext),
        jnp.asarray(conic), jnp.asarray(qmax), h, w, cfg,
    )
    a = bin_gaussians(*args)
    b = bin_gaussians(*args, packed_paths=False)
    for name in (
        "perm", "sorted_owner", "sorted_slot", "tile_start", "gm_start",
        "num_instances", "num_rows",
    ):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, name)), np.asarray(getattr(b, name)), name
        )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_rank_prefix_pallas_bit_exact(seed):
    """The MXU rank-expansion kernel must be BIT-identical to the XLA
    scatter-add + running-cumsum it replaces — including full-range uint32
    wraparound, zero-length runs (equal starts), runs past the budget
    (scatter mode="drop"), and non-multiple-of-block budgets."""
    from gsjax.render.binning import _expand, _expand_packed
    from gsjax.render.pallas_kernels import rank_prefix_pallas

    rng = np.random.default_rng(seed)
    r = int(rng.integers(3, 700))
    budget = int(rng.integers(8, 5000))
    counts = rng.integers(0, 5, r)
    counts[rng.integers(0, r, r // 3)] = 0  # extra zero-length runs
    start = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    vals = rng.integers(0, 2**32, r, dtype=np.uint64).astype(np.uint32)
    u = vals - start.astype(np.uint32)
    delta = (u - np.concatenate([[0], u[:-1]]).astype(np.uint32)).astype(
        np.uint32
    )
    ref = np.asarray(_expand_packed(jnp.asarray(vals), jnp.asarray(start), budget))
    got = np.asarray(
        rank_prefix_pallas(
            jnp.asarray(start), jnp.asarray(delta), budget=budget,
            plus_iota=True, interpret=True,
        )
    )
    np.testing.assert_array_equal(ref, got)

    own_ref, _ = _expand(jnp.asarray(start), budget)
    own = np.asarray(
        rank_prefix_pallas(
            jnp.asarray(start), jnp.ones(r, jnp.uint32), budget=budget,
            init=-1, interpret=True,
        )
    ).astype(np.int64)
    own[own > 2**31] -= 2**32
    np.testing.assert_array_equal(np.asarray(own_ref), own)
