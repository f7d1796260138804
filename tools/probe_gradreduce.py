"""Break down the backward's grad-reduction stage (VERDICT r4 #1: 13 ms =
inverse-perm sort + (P,16) row gather + segment sum) into its pieces on the
real chip, plus candidate variants, to decide where the next milliseconds
come from.

Pieces (bench scale: P = 1179648 budget, N = 500k):
  a. inverse-perm 2-array sort
  b. transpose (16,P) -> (P,16)
  c. row gather (P,16) by index
  d. transpose back
  e. b+c+d fused as XLA sees it (take on inst_grads.T)
  f. lane-axis gather take(axis=1) (the transpose-free alternative)
  g. segment_sum_pallas on the regrouped stream
  h. the shipping reduce_grads end-to-end
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
from gsjax.render.binning import bin_gaussians
from gsjax.render.common import ROWS, N_FIELDS
from gsjax.render.pallas_kernels import segment_sum_pallas
from gsjax.render.preprocess import preprocess
from gsjax.synthetic import look_at_origin_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N = 500_000
BUDGET = 1_179_648
ROW_BUDGET = 524_288
ITERS = 30


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:44s} {dt:8.3f} ms", flush=True)
    return out


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    cfg = RasterConfig(tile_w=32, tile_h=32, max_instances=BUDGET,
                       max_rows=ROW_BUDGET, interpret=not on_tpu)
    proj = jax.jit(lambda p: preprocess(
        xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
        scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
        active_sh_degree=3, alive=aux.alive))(params)
    binning = jax.jit(lambda mp, d, e, c, q: bin_gaussians(
        mp, d, e, c, q, HEIGHT, WIDTH, cfg))(
        proj.mean_pix, proj.depth, proj.ext, proj.conic, proj.qmax)

    key = jax.random.PRNGKey(0)
    inst_grads = jax.random.normal(key, (ROWS, BUDGET), jnp.float32)
    pp = binning.sorted_slot.shape[0]
    iota = jnp.arange(pp, dtype=jnp.int32)

    inv_sort = jax.jit(lambda ss: lax.sort(
        (ss, iota), num_keys=1, is_stable=True)[1])
    slot_of_inst = timeit("a. inverse-perm sort", inv_sort, binning.sorted_slot)

    timeit("b. transpose (16,P)->(P,16)", jax.jit(lambda g: g.T + 0.0),
           inst_grads)
    gT = jnp.asarray(np.asarray(inst_grads).T)  # materialized (P,16)
    timeit("c. row gather (P,16) native", jax.jit(
        lambda t, i: jnp.take(t, i, axis=0)), gT, slot_of_inst)
    timeit("e. take(inst_grads.T).T (shipping)", jax.jit(
        lambda g, i: jnp.take(g.T, i, axis=0).T), inst_grads, slot_of_inst)
    timeit("f. lane gather take(axis=1)", jax.jit(
        lambda g, i: jnp.take(g, i, axis=1)), inst_grads, slot_of_inst)

    vals = jnp.take(inst_grads.T, slot_of_inst, axis=0).T
    timeit("g. segment_sum_pallas", jax.jit(
        lambda v, gm: segment_sum_pallas(v, gm, interpret=cfg.interpret)),
        vals, binning.gm_start)

    def reduce_grads(ig, ss, gm):
        _, soi = lax.sort((ss, iota), num_keys=1, is_stable=True)
        v = jnp.take(ig.T, soi, axis=0).T
        n = gm.shape[0] - 1
        return segment_sum_pallas(v, gm, interpret=cfg.interpret)[:N_FIELDS, :n].T

    timeit("h. reduce_grads end-to-end", jax.jit(reduce_grads),
           inst_grads, binning.sorted_slot, binning.gm_start)


if __name__ == "__main__":
    main()
