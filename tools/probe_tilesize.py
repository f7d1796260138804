"""Probe: exact (gaussian, tile) pair counts for candidate tile shapes.

Replays binning's level-1/level-2 counting (rect + exact row x-interval)
for a (tile_w, tile_h) grid without building the stream — decides whether
rectangular tiles pay for themselves (instance-rate pipeline cost scales
with pairs; per-chunk kernel cost scales with tile area).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.render.binning import _row_x_interval, CULL_QMAX_MARGIN
from gsjax.render.preprocess import preprocess
from gsjax.synthetic import look_at_origin_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N = 500_000


def count_pairs(proj, tile_w: int, tile_h: int):
    tiles_x = -(-WIDTH // tile_w)
    tiles_y = -(-HEIGHT // tile_h)
    mp = proj.mean_pix
    ext = proj.ext
    x0 = jnp.clip((mp[:, 0] - ext[:, 0]) / tile_w, 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip((mp[:, 1] - ext[:, 1]) / tile_h, 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.ceil((mp[:, 0] + ext[:, 0] + 1.0) / tile_w), 0, tiles_x
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.ceil((mp[:, 1] + ext[:, 1] + 1.0) / tile_h), 0, tiles_y
    ).astype(jnp.int32)
    empty = (ext[:, 0] <= 0.0) | (ext[:, 1] <= 0.0)
    x1 = jnp.where(empty, x0, x1)
    y1 = jnp.where(empty, y0, y1)
    row_counts = y1 - y0
    total_rows = jnp.sum(row_counts)

    # Expand rows the slow-but-simple way: per gaussian, iterate max rows.
    max_rows = int(jnp.max(row_counts))
    qm = proj.qmax * CULL_QMAX_MARGIN + 1e-6
    ca, cb, cc = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    total = jnp.zeros((), jnp.int64) if False else jnp.zeros((), jnp.int32)
    for j in range(max_rows):
        ty = y0 + j
        valid = ty < y1
        y0s = ty.astype(jnp.float32) * tile_h - mp[:, 1]
        x_lo, x_hi, nonempty = _row_x_interval(
            y0s, y0s + (tile_h - 1.0), ca, cb, cc, qm
        )
        rx0 = jnp.ceil((mp[:, 0] + x_lo - (tile_w - 1.0)) / tile_w).astype(
            jnp.int32
        )
        rx1 = jnp.floor((mp[:, 0] + x_hi) / tile_w).astype(jnp.int32) + 1
        rx0 = jnp.maximum(rx0, x0)
        rx1 = jnp.minimum(rx1, x1)
        cnt = jnp.where(valid & nonempty, jnp.maximum(rx1 - rx0, 0), 0)
        total = total + jnp.sum(cnt)
    return int(total), int(total_rows), tiles_x * tiles_y


def main():
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    proj = jax.jit(lambda p: preprocess(
        xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
        scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
        active_sh_degree=3, alive=aux.alive))(params)
    proj = jax.device_get(proj)
    proj = jax.tree.map(jnp.asarray, proj)
    ext = np.asarray(proj.ext)
    live = ext[:, 0] > 0
    print(f"ext px percentiles (live x): "
          f"{np.percentile(ext[live, 0], [5, 25, 50, 75, 95]).round(1)}")
    for tw, th in [(16, 16), (32, 16), (32, 32), (64, 16)]:
        pairs, rows, ntiles = count_pairs(proj, tw, th)
        chunks = pairs / 128
        walks = chunks + 1.0 * ntiles  # ~1 extra boundary walk per tile
        print(f"tile {tw}x{th}: pairs={pairs} rows={rows} tiles={ntiles} "
              f"est_walks={walks/1e3:.1f}k "
              f"kernel_units={walks * tw * th / 1e6:.1f}M", flush=True)


if __name__ == "__main__":
    main()
