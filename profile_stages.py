"""Stage-by-stage wall-clock breakdown of the 1080p/500k fwd+bwd step.

Times each pipeline stage in isolation by dispatching ITERS independent
copies and fencing with a D2H read of the last output (block_until_ready
returns early on tunneled-TPU platforms). Working profiling tool, not a test.

--ply <point_cloud.ply> profiles a TRAINED checkpoint instead of the random
synthetic scene (same camera family as tools/bench_trained.py), with budgets
auto-sized to the scene — for root-causing trained-vs-synthetic rate gaps.
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()  # minutes-per-compile over the TPU tunnel
import numpy as np

from gsjax.config import RasterConfig
from gsjax.render.api import render
from gsjax.render.binning import bin_gaussians, num_tiles
from gsjax.render.common import build_inst_data
from gsjax.render.composite import CompositeStatic
from gsjax.render.pallas_kernels import (
    composite_backward_pallas,
    composite_forward_pallas,
)
from gsjax.render.preprocess import preprocess
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.loss import l1_loss

WIDTH, HEIGHT = 1920, 1080
N = 500_000
SH_DEGREE = 3
ITERS = 30
# Match bench.py's snug budgets exactly so stage times sum to the headline
# step (instance-rate stages scale with the BUDGET, not the true count).
BUDGET = 1_179_648
ROW_BUDGET = 524_288


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
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", default=None,
                    help="profile a trained checkpoint PLY instead of the "
                         "random scene")
    ap.add_argument("--orbit", type=float, default=0.6)
    args = ap.parse_args()
    global SH_DEGREE
    on_tpu = jax.default_backend() == "tpu"
    if args.ply:
        from gsjax.data.ply import load_gaussian_ply
        from gsjax.model import GaussianAux, pad_gaussian_params
        from tools.bench_trained import _orbit_camera

        data = load_gaussian_ply(args.ply)
        n = data["xyz"].shape[0]
        cap = max(1 << (n - 1).bit_length(), 1024)
        params = pad_gaussian_params(capacity=cap, **data)
        aux = GaussianAux.create(cap, n)
        SH_DEGREE = int(round(np.sqrt(data["features_rest"].shape[1] + 1))) - 1
        camera = _orbit_camera(args.orbit, WIDTH, HEIGHT)
        from gsjax.config import pow2_budget
        probe_cfg = RasterConfig(
            tile_w=32, tile_h=32, max_instances=2 ** 22, max_rows=2 ** 22,
            interpret=not on_tpu,
        )
        probe = jax.jit(lambda p: render(
            p, camera, active_sh_degree=SH_DEGREE,
            bg_color=jnp.zeros(3, jnp.float32), cfg=probe_cfg,
            alive=aux.alive))(params)
        mi = pow2_budget(int(probe.num_instances), 1.03)
        mr = pow2_budget(int(probe.num_rows), 1.03)
        print(f"trained ply: {n} gaussians cap {cap} SH {SH_DEGREE} "
              f"pairs {int(probe.num_instances)} rows {int(probe.num_rows)} "
              f"budgets {mi}/{mr}", flush=True)
        cfg = RasterConfig(tile_w=32, tile_h=32, max_instances=mi,
                           max_rows=mr, interpret=not on_tpu)
    else:
        params, aux = random_scene(
            N, capacity=N, sh_degree=SH_DEGREE, seed=0, spread=2.5,
            scale_range=(0.004, 0.03),
        )
        camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
        cfg = RasterConfig(
            tile_w=32, tile_h=32, max_instances=BUDGET, max_rows=ROW_BUDGET,
            interpret=not on_tpu,
        )
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    alive = aux.alive
    offset = jnp.zeros((params.capacity, 2), jnp.float32)

    def loss_fn(p, off):
        out = render(p, camera, active_sh_degree=SH_DEGREE, bg_color=bg,
                     cfg=cfg, alive=alive, mean2d_offset=off)
        return l1_loss(out.image, gt)

    step = jax.jit(lambda p, off: jax.value_and_grad(loss_fn, argnums=(0, 1))(p, off))
    timeit("FULL fwd+bwd step", step, params, offset, fence=lambda o: o[0])

    fwd_only = jax.jit(loss_fn)
    timeit("FULL fwd only", fwd_only, params, offset, fence=lambda o: o)

    pre = jax.jit(lambda p, off: preprocess(
        xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
        scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
        active_sh_degree=SH_DEGREE, scaling_modifier=1.0,
        mean2d_offset=off, alive=alive))
    proj = timeit("preprocess (fwd)", pre, params, offset)

    def pre_loss(p, off):
        pr = pre(p, off)
        return (jnp.sum(pr.mean_pix) + jnp.sum(pr.conic) + jnp.sum(pr.rgb)
                + jnp.sum(pr.opacity) + jnp.sum(pr.depth))
    pre_grad = jax.jit(jax.grad(pre_loss, argnums=(0, 1)))
    timeit("preprocess fwd+bwd", pre_grad, params, offset, fence=lambda o: o[1])

    # Fence on the SCALAR output. All outputs of one XLA program complete
    # together, so any fetch waits for the whole program — but fetching even
    # one element of a large alternate-memory-resident array (sorted_owner)
    # pays a ~14 ms D2H staging copy on the tunneled platform, which
    # inflated the binning row ~2x through r4/r5 (true device makespan
    # 15.1 ms/iter vs 30 reported; see tools/trace_step.py evidence in
    # README round-5 notes).
    binf = jax.jit(lambda mp, d, e, c, q: bin_gaussians(mp, d, e, c, q, HEIGHT, WIDTH, cfg))
    binning = timeit("binning", binf, proj.mean_pix, proj.depth, proj.ext,
                     proj.conic, proj.qmax, fence=lambda b: b.num_instances)

    from gsjax.render.composite import pack_fields

    gather = jax.jit(lambda mp, c, rgb, op, so, perm: build_inst_data(
        jnp.take(pack_fields(mp, c, rgb, op), perm, axis=0), so))
    inst = timeit("permute+build_inst_data", gather, proj.mean_pix, proj.conic,
                  proj.rgb, proj.opacity, binning.sorted_owner, binning.perm)

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

    def reduce_grads(inst_grads, sorted_slot, gm_start):
        # The shipping regroup (composite._composite_bwd): invert the ridden
        # tile-sort permutation (2-array sort), gather the grad stream back
        # to owner-major expansion order, segment-sum gm_start runs.
        from jax import lax
        from gsjax.render import common as C
        from gsjax.render.pallas_kernels import segment_sum_pallas
        pp = sorted_slot.shape[0]
        _, slot_of_inst = lax.sort(
            (sorted_slot, jnp.arange(pp, dtype=jnp.int32)),
            num_keys=1, is_stable=True,
        )
        vals = jnp.take(inst_grads.T, slot_of_inst, axis=0).T
        n = gm_start.shape[0] - 1
        sums = segment_sum_pallas(vals, gm_start, interpret=cfg.interpret)
        return sums[: C.N_FIELDS, :n].T
    red = jax.jit(reduce_grads)
    timeit("grad reduction", red, ig, binning.sorted_slot, binning.gm_start)

    n_inst = int(binning.num_instances)
    live = int(np.asarray(binning.tile_start)[-1])
    print(f"\nrect instances: {n_inst} (budget {cfg.max_instances}); "
          f"live after exact cull: {live}", flush=True)


if __name__ == "__main__":
    main()
