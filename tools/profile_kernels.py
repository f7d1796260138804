"""Quick composite-kernel-only timing (subset of profile_stages.py for fast
iteration on kernel changes; same scene/budgets as bench.py)."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()  # minutes-per-compile over the TPU tunnel
import numpy as np

from gsjax.config import RasterConfig
from gsjax.render.binning import bin_gaussians, num_tiles
from gsjax.render.common import build_inst_data
from gsjax.render.composite import CompositeStatic, pack_fields
from gsjax.render.pallas_kernels import (
    composite_backward_pallas,
    composite_forward_pallas,
)
from gsjax.render.preprocess import preprocess
from gsjax.synthetic import look_at_origin_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N = 500_000
ITERS = 30


def timeit(name, fn, *args, fence=None):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    leaf = fence(out) if fence else jax.tree.leaves(out)[0]
    _ = np.asarray(jax.device_get(leaf.ravel()[:1]))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:34s} {dt:9.2f} ms", flush=True)
    return out


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--max_instances", type=int, default=3 * 2**20)
    ap.add_argument("--max_rows", type=int, default=2**21)
    ap.add_argument("--tile_w", type=int, default=16)
    ap.add_argument("--tile_h", type=int, default=16)
    ap.add_argument("--strips", type=int, default=1)
    ap.add_argument("--binning_only", action="store_true")
    args = ap.parse_args()

    on_tpu = jax.default_backend() == "tpu"
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    cfg = RasterConfig(
        max_instances=args.max_instances, max_rows=args.max_rows,
        tile_w=args.tile_w, tile_h=args.tile_h, strips=args.strips,
        interpret=not on_tpu,
    )
    offset = jnp.zeros((N, 2), jnp.float32)

    pre = jax.jit(lambda p, off: preprocess(
        xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
        scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
        active_sh_degree=3, scaling_modifier=1.0,
        mean2d_offset=off, alive=aux.alive))
    proj = pre(params, offset)

    binf = jax.jit(lambda mp, d, e, c, q: bin_gaussians(
        mp, d, e, c, q, HEIGHT, WIDTH, cfg))
    binning = timeit("binning", binf, proj.mean_pix, proj.depth, proj.ext,
                     proj.conic, proj.qmax, fence=lambda b: b.sorted_owner)
    print(f"  true instances {int(binning.num_instances)} rows "
          f"{int(binning.num_rows)}", flush=True)
    if args.binning_only:
        return

    gather = jax.jit(lambda mp, c, rgb, op, so, perm: build_inst_data(
        jnp.take(pack_fields(mp, c, rgb, op), perm, axis=0), so))
    inst = timeit("permute+build_inst_data", gather, proj.mean_pix,
                  proj.conic, proj.rgb, proj.opacity, binning.sorted_owner,
                  binning.perm)

    tiles_x, tiles_y = num_tiles(HEIGHT, WIDTH, cfg.tw, cfg.th)
    static = CompositeStatic(n_tiles=tiles_x * tiles_y, tiles_x=tiles_x,
                             tile_w=cfg.tw, tile_h=cfg.th, chunk=cfg.chunk,
                             strips=cfg.strips, interpret=cfg.interpret)

    fwdk = jax.jit(lambda i, ts: composite_forward_pallas(
        i, ts, n_tiles=static.n_tiles, tiles_x=static.tiles_x,
        tile_w=static.tile_w, tile_h=static.tile_h, chunk=static.chunk,
        strips=static.strips, interpret=static.interpret))
    tc, tt3 = timeit("composite fwd kernel", fwdk, inst, binning.tile_start,
                     fence=lambda o: o[0])

    dtc = jnp.ones_like(tc)
    sfx0 = jnp.sum(dtc * tc, axis=-1) + tt3[..., 0]  # (T, PIX)
    cot = jnp.concatenate(
        [jnp.swapaxes(dtc, 1, 2), sfx0[:, None, :],
         jnp.zeros((sfx0.shape[0], 4, sfx0.shape[1]), jnp.float32)], axis=1)
    bwdk = jax.jit(lambda i, ts, c: composite_backward_pallas(
        i, ts, c, n_tiles=static.n_tiles, tiles_x=static.tiles_x,
        tile_w=static.tile_w, tile_h=static.tile_h, chunk=static.chunk,
        strips=static.strips, interpret=static.interpret))
    ig = timeit("composite bwd kernel", bwdk, inst, binning.tile_start, cot)

    from jax import lax

    from gsjax.render import common as C
    from gsjax.render.pallas_kernels import segment_sum_pallas

    def reduce_grads(inst_grads, owners, gm_start):
        rows = tuple(inst_grads[i] for i in range(C.N_FIELDS))
        gm = lax.sort((owners, *rows), num_keys=1, is_stable=True)
        vals = jnp.pad(jnp.stack(gm[1:], axis=0), ((0, 7), (0, 0)))
        nn = gm_start.shape[0] - 1
        sums = segment_sum_pallas(vals, gm_start, interpret=cfg.interpret)
        return sums[:, :nn].T
    timeit("grad reduction", jax.jit(reduce_grads), ig,
           binning.sorted_owner, binning.gm_start)

    # Image assembly + loss + their VJP cotangent prep (everything between
    # the composite outputs and the kernel cotangent inputs).
    from gsjax.render.common import untile_image
    from gsjax.train.loss import l1_loss

    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    bgc = jnp.zeros(3, jnp.float32)

    def assemble_loss(tc, tt3):
        color, trans = untile_image(
            tc, tt3[..., 0], HEIGHT, WIDTH, tiles_x, tiles_y, cfg.tw, cfg.th)
        img = color + trans[None] * bgc[:, None, None]
        return l1_loss(img, gt)
    timeit("untile+loss fwd+bwd",
           jax.jit(lambda a, b: jax.grad(assemble_loss, (0, 1))(a, b)),
           tc, tt3)

    timeit("preprocess fwd+bwd", jax.jit(lambda p, off: jax.grad(
        lambda pp, oo: sum(jnp.sum(x) for x in [
            *(getattr(preprocess(
                xyz=pp.xyz, sh=pp.get_features(), opacity=pp.get_opacity(),
                scaling=pp.get_scaling(), rotation=pp.rotation, camera=camera,
                active_sh_degree=3, mean2d_offset=oo, alive=aux.alive,
            ), f) for f in ("mean_pix", "conic", "rgb", "opacity", "depth")),
        ]), argnums=1)(p, off)), params, offset)


if __name__ == "__main__":
    main()
