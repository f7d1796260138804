"""Ablation profiling of the composite kernels: measure stripped-down
variants (DMA-only walk, replay-without-grads, no-carry-writes) to locate
where kernel wall-clock actually goes. Throwaway measurement gear, not
part of the library."""

from __future__ import annotations

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()  # minutes-per-compile over the TPU tunnel
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsjax.config import RasterConfig
from gsjax.render.binning import bin_gaussians, num_tiles
from gsjax.render.common import (
    ROWS,
    build_inst_data,
    chunk_backward,
    chunk_forward,
    moment_basis,
    tile_pixel_coords,
)
from gsjax.render.composite import pack_fields
from gsjax.render.pallas_kernels import _chunk_range, _lane_mask
from gsjax.render.preprocess import preprocess
from gsjax.synthetic import look_at_origin_camera, random_scene

WIDTH, HEIGHT = 1920, 1080
N = 500_000
ITERS = 30
TILE_W = TILE_H = 32
MAXI, MAXR = 1_179_648, 524_288


def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    dt = (time.perf_counter() - t0) / ITERS * 1000
    print(f"{name:40s} {dt:9.2f} ms", flush=True)


def _blockout_kernel(
    tile_start_ref, inst_hbm, color_ref, t_ref, inst_vmem, sems,
    *, tiles_x, chunk, semantics,
):
    """chunk_forward walk + full (1, PIX, 3)/(1, PIX, 1) block outputs —
    isolates the output-block pipeline cost vs the replay_fwd variant."""
    del semantics
    t = pl.program_id(0)
    i0 = tile_start_ref[t]
    i1 = tile_start_ref[t + 1]
    c0, n = _chunk_range(i0, i1, chunk)
    pix = TILE_W * TILE_H
    px, py = tile_pixel_coords(t, tiles_x, TILE_W, TILE_H)
    nbuf = inst_vmem.shape[0]

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds((c0 + j) * chunk, chunk)],
            inst_vmem.at[slot], sems.at[slot],
        )

    for k in range(nbuf - 1):
        @pl.when(k < n)
        def _(k=k):
            get_dma(k, k).start()

    def body(j, carry):
        t_in, done_in, alldone, acc = carry
        slot = j % nbuf

        @pl.when(j + nbuf - 1 < n)
        def _():
            get_dma((j + nbuf - 1) % nbuf, j + nbuf - 1).start()

        get_dma(slot, j).wait()

        def compute(op):
            t_c, done_c, acc_c = op
            inst = inst_vmem[slot]
            mask = _lane_mask(c0, j, i0, i1, chunk)
            t_out, done_out, contrib = chunk_forward(
                inst, px, py, t_c, done_c, mask
            )
            return t_out, done_out, jnp.min(done_out) >= 0.5, acc_c + contrib

        def skip(op):
            t_c, done_c, acc_c = op
            return t_c, done_c, jnp.bool_(True), acc_c

        return lax.cond(alldone, skip, compute, (t_in, done_in, acc))

    init = (
        jnp.ones((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.float32),
        jnp.bool_(False),
        jnp.zeros((pix, 3), jnp.float32),
    )
    t_fin, _, _, acc = lax.fori_loop(0, n, body, init)
    color_ref[0] = acc
    t_ref[0] = t_fin


@functools.partial(jax.jit, static_argnames=("n_tiles", "tiles_x", "semantics"))
def run_blockout(inst_data, tile_start, *, n_tiles, tiles_x, semantics):
    pix = TILE_W * TILE_H
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, pix, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, pix, 1), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kernel = functools.partial(
        _blockout_kernel, tiles_x=tiles_x, chunk=128, semantics=semantics
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, pix, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, pix, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(semantics,),
        ),
    )(tile_start, inst_data)


def _variant_kernel(
    tile_start_ref, inst_hbm, out_ref, inst_vmem, sems,
    *, tiles_x, variant, chunk,
):
    t = pl.program_id(0)
    i0 = tile_start_ref[t]
    i1 = tile_start_ref[t + 1]
    c0, n = _chunk_range(i0, i1, chunk)
    pix = TILE_W * TILE_H
    px, py = tile_pixel_coords(t, tiles_x, TILE_W, TILE_H)
    basis = moment_basis(px, py)
    nbuf = inst_vmem.shape[0]

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds((c0 + j) * chunk, chunk)],
            inst_vmem.at[slot], sems.at[slot],
        )

    for k in range(nbuf - 1):
        @pl.when(k < n)
        def _(k=k):
            get_dma(k, k).start()

    d_color = jnp.full((pix, 3), 1e-6, jnp.float32)

    def body(j, carry):
        t_in, done_in, sfx, alldone, acc = carry
        slot = j % nbuf

        @pl.when(j + nbuf - 1 < n)
        def _():
            get_dma((j + nbuf - 1) % nbuf, j + nbuf - 1).start()

        get_dma(slot, j).wait()

        if variant == "dma_only":
            inst = inst_vmem[slot]
            return (t_in, done_in, sfx, alldone,
                    acc + inst[0:1, 0:1] * 1e-20)

        if variant == "fwd_nodep":
            # chunk_forward with a CONSTANT carry (t_in=1, done=0 every
            # chunk): iterations are data-independent (except the trivial
            # acc add), so this is the walk's pure-throughput ceiling —
            # the gap to fwd_nocond is the cost of the serial T chain.
            inst = inst_vmem[slot]
            mask = _lane_mask(c0, j, i0, i1, chunk)
            ones = jnp.ones((pix, 1), jnp.float32)
            zeros = jnp.zeros((pix, 1), jnp.float32)
            t_out, done_out, contrib = chunk_forward(
                inst, px, py, ones, zeros, mask
            )
            return (t_in, done_in, sfx, alldone,
                    acc + contrib[0:1, :1] + t_out[0:1, :1] * 1e-20)

        if variant == "fwd_nocond":
            # chunk_forward with NO alldone lax.cond: tests whether the
            # scalar-predicated branch blocks Mosaic's cross-iteration
            # software pipelining (per-chunk cost stuck at the body's
            # critical-path latency regardless of removed compute).
            inst = inst_vmem[slot]
            mask = _lane_mask(c0, j, i0, i1, chunk)
            t_out, done_out, contrib = chunk_forward(
                inst, px, py, t_in, done_in, mask
            )
            return (t_out, done_out, sfx, alldone,
                    acc + contrib[0:1, :1])

        def compute(op):
            t_c, done_c, sfx_c, acc_c = op
            inst = inst_vmem[slot]
            mask = _lane_mask(c0, j, i0, i1, chunk)
            if variant == "replay_fwd":
                t_out, done_out, contrib = chunk_forward(
                    inst, px, py, t_c, done_c, mask
                )
                return (t_out, done_out, sfx_c,
                        jnp.min(done_out) >= 0.5, acc_c + contrib[0:1, :1])
            (t_out, done_out, sfx_out), grads = chunk_backward(
                inst, px, py, t_c, done_c, sfx_c, d_color, mask, basis,
            )
            # Consume grads so nothing is DCE'd, but do NOT write them out.
            return (t_out, done_out, sfx_out, jnp.min(done_out) >= 0.5,
                    acc_c + grads[0:1, 0:1])

        def skip(op):
            t_c, done_c, sfx_c, acc_c = op
            return t_c, done_c, sfx_c, jnp.bool_(True), acc_c

        return lax.cond(alldone, skip, compute,
                        (t_in, done_in, sfx, acc))

    init = (
        jnp.ones((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.float32),
        jnp.full((pix, 1), 1e-3, jnp.float32),
        jnp.bool_(False),
        jnp.zeros((1, 1), jnp.float32),
    )
    _, _, _, _, acc = lax.fori_loop(0, n, body, init)
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnames=("n_tiles", "tiles_x", "variant"))
def run_variant(inst_data, tile_start, *, n_tiles, tiles_x, variant):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec((1, 1, 1), lambda i, *_: (i, 0, 0))],
        scratch_shapes=[
            pltpu.VMEM((4, ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    kernel = functools.partial(
        _variant_kernel, tiles_x=tiles_x, variant=variant, chunk=128
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 1, 1), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
    )(tile_start, inst_data)


def main():
    variants = sys.argv[1:] or ["dma_only", "replay_fwd", "bwd_nowrite"]
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    cfg = RasterConfig(
        tile_w=TILE_W, tile_h=TILE_H, max_instances=MAXI, max_rows=MAXR,
    )
    offset = jnp.zeros((N, 2), jnp.float32)
    proj = jax.jit(lambda p, off: preprocess(
        xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
        scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
        active_sh_degree=3, mean2d_offset=off, alive=aux.alive,
    ))(params, offset)
    binning = jax.jit(lambda mp, d, e, c, q: bin_gaussians(
        mp, d, e, c, q, HEIGHT, WIDTH, cfg))(
        proj.mean_pix, proj.depth, proj.ext, proj.conic, proj.qmax)
    inst = jax.jit(lambda mp, c, rgb, op, so, perm: build_inst_data(
        jnp.take(pack_fields(mp, c, rgb, op), perm, axis=0), so))(
        proj.mean_pix, proj.conic, proj.rgb, proj.opacity,
        binning.sorted_owner, binning.perm)
    tiles_x, tiles_y = num_tiles(HEIGHT, WIDTH, TILE_W, TILE_H)
    for v in variants:
        if v.startswith("blockout"):
            sem = "parallel" if v.endswith("parallel") else "arbitrary"
            timeit(f"variant:{v}", lambda i, ts, sem=sem: run_blockout(
                i, ts, n_tiles=tiles_x * tiles_y, tiles_x=tiles_x,
                semantics=sem), inst, binning.tile_start)
            continue
        timeit(f"variant:{v}", lambda i, ts, v=v: run_variant(
            i, ts, n_tiles=tiles_x * tiles_y, tiles_x=tiles_x, variant=v),
            inst, binning.tile_start)


if __name__ == "__main__":
    main()
