"""Probe: how much early-termination headroom does the bench scene have?

Reports the distribution of per-tile 'live chunk count' — the number of
chunks a tile must composite before EVERY pixel terminates — vs the total
chunks in its range. The gap is the compute an all-done skip would save.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp

from gsjax.config import RasterConfig
from gsjax.render.api import render
from gsjax.synthetic import look_at_origin_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N = 500_000
SH_DEGREE = 3


def main():
    on_tpu = jax.default_backend() == "tpu"
    params, aux = random_scene(
        N, capacity=N, sh_degree=SH_DEGREE, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    cfg = RasterConfig(max_instances=3 * 2**20, max_rows=2**21,
                       interpret=not on_tpu)
    bg = jnp.zeros(3, jnp.float32)

    from gsjax.render.binning import bin_gaussians, num_tiles
    from gsjax.render.common import untile_image
    from gsjax.render.composite import CompositeStatic, composite, pack_fields
    from gsjax.render.preprocess import preprocess

    def t_map(p):
        proj = preprocess(
            xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
            scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
            active_sh_degree=SH_DEGREE, alive=aux.alive)
        binning = bin_gaussians(proj.mean_pix, proj.depth, proj.ext,
                                proj.conic, proj.qmax, HEIGHT, WIDTH, cfg)
        tiles_x, tiles_y = num_tiles(HEIGHT, WIDTH, cfg.tw, cfg.th)
        static = CompositeStatic(
            n_tiles=tiles_x * tiles_y, tiles_x=tiles_x,
            tile_w=cfg.tw, tile_h=cfg.th, chunk=cfg.chunk,
            strips=cfg.strips, interpret=cfg.interpret)
        fields = pack_fields(proj.mean_pix, proj.conic, proj.rgb, proj.opacity)
        tile_color, tile_t = composite(
            jnp.take(fields, binning.perm, axis=0), binning, static)
        _, transmittance = untile_image(
            tile_color, tile_t, HEIGHT, WIDTH, tiles_x, tiles_y,
            cfg.tw, cfg.th)
        return transmittance

    t = np.asarray(jax.jit(t_map)(params))
    print(f"T percentiles: {np.percentile(t, [1, 5, 25, 50, 75, 95, 99])}")
    print(f"frac pixels T < 1e-4 (terminated): {(t < 1e-4).mean():.4f}")
    print(f"frac pixels T < 1e-2: {(t < 1e-2).mean():.4f}")

    # Per-tile: chunks until all pixels would be done, via the oracle-free
    # route: recompute per-tile transmittance trajectory is expensive; proxy
    # instead with per-tile terminated fraction.
    tsw, tsh = cfg.tw, cfg.th
    th, tw = HEIGHT // tsh, WIDTH // tsw
    tt = (t[: th * tsh, : tw * tsw]
          .reshape(th, tsh, tw, tsw).transpose(0, 2, 1, 3))
    tile_done_frac = (tt < 1e-4).reshape(th * tw, -1).mean(axis=1)
    print(f"frac tiles fully terminated: {(tile_done_frac == 1.0).mean():.4f}")
    print(f"tile done-frac percentiles: "
          f"{np.percentile(tile_done_frac, [5, 25, 50, 75, 95])}")


if __name__ == "__main__":
    main()
