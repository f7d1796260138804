"""Sub-stage wall-clock breakdown of bin_gaussians on the real TPU.

Times each internal stage of the binning pipeline in ISOLATION (inputs
precomputed on device, each stage its own jit, D2H fence per timing batch)
so the 29.7 ms aggregate (profile_stages.py) decomposes into primitive
costs that can be compared against tools/probe_prims.py floors.
Working profiling tool, not a test.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()

from gsjax.config import RasterConfig
from gsjax.render.binning import (
    _expand,
    _expand_packed,
    _f2i,
    bin_gaussians,
    depth_order,
    num_tiles,
    tile_rect_ext,
    _row_x_interval,
    _i2f,
    CULL_QMAX_MARGIN,
)
from gsjax.render.preprocess import preprocess
from gsjax.synthetic import look_at_origin_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N = 500_000
ITERS = 30
BUDGET = 1_179_648
ROW_BUDGET = 524_288


def timeit(name, fn, *args):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn_j(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return out


def main():
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    cfg = RasterConfig(
        tile_w=32, tile_h=32, max_instances=BUDGET, max_rows=ROW_BUDGET,
    )
    proj = jax.jit(lambda p: preprocess(
        xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
        scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
        active_sh_degree=3, scaling_modifier=1.0,
        mean2d_offset=jnp.zeros((N, 2), jnp.float32), alive=aux.alive,
    ))(params)
    mean_pix, depth, ext, conic, qmax = (
        proj.mean_pix, proj.depth, proj.ext, proj.conic, proj.qmax)

    tiles_x, tiles_y = num_tiles(HEIGHT, WIDTH, cfg.tw, cfg.th)
    n_tiles = tiles_x * tiles_y
    P, R = cfg.max_instances, cfg.max_rows
    tsx, tsy = float(cfg.tw), float(cfg.th)

    # Whole pipeline for reference.
    timeit("bin_gaussians (whole)", lambda mp, d, e, c, q: bin_gaussians(
        mp, d, e, c, q, HEIGHT, WIDTH, cfg), mean_pix, depth, ext, conic, qmax)

    # --- stage inputs, materialized once -----------------------------------
    perm = jax.jit(depth_order)(depth)
    packed0 = jnp.concatenate([mean_pix, conic, ext, qmax[:, None]], axis=-1)
    packed = jnp.take(packed0, perm, axis=0)
    mp, co, ex, qm = (packed[:, 0:2], packed[:, 2:5], packed[:, 5:7],
                      packed[:, 7])
    x0, y0, x1, y1 = jax.jit(lambda m, e: tile_rect_ext(
        m, e, tiles_x, tiles_y, cfg.tw, cfg.th))(mp, ex)
    row_counts = y1 - y0
    rcum = jnp.cumsum(row_counts)
    rstart = rcum - row_counts
    rowner, r = jax.jit(lambda s: _expand(s, R))(rstart)
    rvalid = r < jnp.minimum(rcum[-1], R)
    rg = jnp.clip(rowner, 0, N - 1)
    row_table = jnp.stack(
        [rstart, y0, x0, x1, _f2i(mp[:, 0]), _f2i(mp[:, 1]),
         _f2i(co[:, 0]), _f2i(co[:, 1]), _f2i(co[:, 2]),
         _f2i(qm * CULL_QMAX_MARGIN + 1e-6)], axis=-1)
    rt = jnp.take(row_table, rg, axis=0)

    def interval_math(rt, r, rvalid):
        ty = rt[:, 1] + (r - rt[:, 0])
        mx = _i2f(rt[:, 4])
        y0s = ty.astype(jnp.float32) * tsy - _i2f(rt[:, 5])
        x_lo, x_hi, nonempty = _row_x_interval(
            y0s, y0s + (tsy - 1.0), _i2f(rt[:, 6]), _i2f(rt[:, 7]),
            _i2f(rt[:, 8]), _i2f(rt[:, 9]))
        rx0 = jnp.ceil((mx + x_lo - (tsx - 1.0)) / tsx).astype(jnp.int32)
        rx1 = jnp.floor((mx + x_hi) / tsx).astype(jnp.int32) + 1
        rx0 = jnp.maximum(rx0, rt[:, 2])
        rx1 = jnp.minimum(rx1, rt[:, 3])
        ic = jnp.where(rvalid & nonempty, jnp.maximum(rx1 - rx0, 0), 0)
        return ic, ty * tiles_x + rx0

    inst_counts, tile_base = jax.jit(interval_math)(rt, r, rvalid)
    icum = jnp.cumsum(inst_counts)
    istart = icum - inst_counts
    total = icum[-1]

    bits_tile = max((n_tiles - 1).bit_length(), 1)
    bits_p = max((P - 1).bit_length(), 1)
    bits_tile_s = max(n_tiles.bit_length(), 1)
    packed_w = (rg.astype(jnp.uint32) << bits_tile) | tile_base.astype(
        jnp.uint32)
    w = jax.jit(lambda v, s: _expand_packed(v, s, P))(packed_w, istart)
    p_iota = jnp.arange(P, dtype=jnp.int32)
    ivalid = p_iota < jnp.minimum(total, P)
    g = jnp.where(ivalid,
                  jnp.clip((w >> bits_tile).astype(jnp.int32), 0, N - 1), N)
    tile = jnp.where(
        ivalid, (w & jnp.uint32((1 << bits_tile) - 1)).astype(jnp.int32),
        n_tiles)
    key = (tile.astype(jnp.uint32) << bits_p) | p_iota.astype(jnp.uint32)

    # --- isolated stage timings --------------------------------------------
    timeit("1 depth sort (f32 key + iota)", depth_order, depth)
    timeit("2 N-rate (N,8) permute gather",
           lambda pk, pr: jnp.take(pk, pr, axis=0), packed0, perm)
    timeit("3 rects + row cumsum (N-rate math)",
           lambda m, e: tile_rect_ext(m, e, tiles_x, tiles_y, cfg.tw,
                                      cfg.th), mp, ex)
    timeit("4 L1 expand (scatter N->R + cumsum R)",
           lambda s: _expand(s, R), rstart)
    timeit("5 (R,10) row-table gather",
           lambda t, i: jnp.take(t, i, axis=0), row_table, rg)
    timeit("6 row-interval math (R-rate VPU)", interval_math, rt, r, rvalid)
    timeit("7 inst cumsum (R)", jnp.cumsum, inst_counts)
    timeit("8 L2 packed expand (scatter R->P + cumsum P)",
           lambda v, s: _expand_packed(v, s, P), packed_w, istart)
    timeit("9 unpack+mask (P-rate VPU)",
           lambda w, t: (jnp.where(p_iota < jnp.minimum(t, P),
                                   (w >> bits_tile).astype(jnp.int32), N)),
           w, total)
    timeit("10 tile sort (u32 key + i32 rider)",
           lambda k, g: lax.sort((k, g), num_keys=1, is_stable=False),
           key, g)
    timeit("11 searchsorted tile starts",
           lambda sk: jnp.searchsorted(
               sk, jnp.arange(n_tiles + 1, dtype=jnp.uint32) << bits_p,
               side="left"), lax.sort((key,), num_keys=1)[0])

    # Variants worth A/B-ing in place:
    timeit("V1 tile sort stable 3-array",
           lambda t, g, p: lax.sort((t, g, p), num_keys=1, is_stable=True),
           tile, g, p_iota)
    timeit("V2 inverse perm via sort (backward regroup)",
           lambda s: lax.sort((s, p_iota), num_keys=1, is_stable=True),
           jnp.where(ivalid, p_iota, P - 1 - p_iota))
    timeit("V3 single u32 cumsum at P", jnp.cumsum,
           w.astype(jnp.uint32))
    timeit("V4 scatter-only R->P (no cumsum)",
           lambda d, s: jnp.zeros(P, jnp.uint32).at[s].add(d, mode="drop"),
           packed_w, istart)
    print(f"\npairs {int(total)} rows {int(rcum[-1])}", flush=True)


if __name__ == "__main__":
    main()
