"""Micro-benchmarks of the instance-rate primitives on the real TPU.

Informs the binning/regroup designs with measured per-row / per-element
costs: row gathers at several widths, scatter-adds, sorts with 1-3 arrays,
int32/uint32 cumsums, and a Pallas pipelined row-gather prototype vs
XLA's native take. Working profiling tool, not a test.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import sys
sys.path.insert(0, "/root/repo")

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()

P = 1_179_648
R = 524_288
N = 500_000
ITERS = 30


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
    return dt


def _gather_kernel(idx_ref, src_hbm, out_hbm, scratch, sems, *, block, width):
    """Row gather with a deep async-DMA pipeline: each output row is one
    DMA from src_hbm[idx[i]] into a VMEM staging block; LOOKAHEAD row DMAs
    stay in flight so HBM latency amortizes to the descriptor-issue cost.
    The staged block flushes to the output with one contiguous DMA."""
    b = pl.program_id(0)
    lookahead = sems.shape[1]

    def row_dma(i):
        return pltpu.make_async_copy(
            src_hbm.at[pl.ds(idx_ref[b * block + i], 1)],
            scratch.at[0, pl.ds(i, 1)],
            sems.at[0, i % lookahead],
        )

    for k in range(lookahead - 1):
        row_dma(k).start()

    def body(i, _):
        @pl.when(i + lookahead - 1 < block)
        def _():
            row_dma(i + lookahead - 1).start()

        row_dma(i).wait()
        return 0

    lax.fori_loop(0, block, body, 0)
    out = pltpu.make_async_copy(
        scratch.at[0], out_hbm.at[pl.ds(b * block, block)], sems.at[1, 0]
    )
    out.start()
    out.wait()


def pallas_row_gather(src, idx, *, block=512):
    p = idx.shape[0]
    width = src.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(p // block,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, block, width), src.dtype),
            pltpu.SemaphoreType.DMA((2, 16)),  # 16-deep row-DMA ring
        ],
    )
    return pl.pallas_call(
        functools.partial(_gather_kernel, block=block, width=width),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((p, width), src.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True
        ),
    )(idx, src)


def main():
    key = jax.random.PRNGKey(0)
    idx_p = jax.random.randint(key, (P,), 0, N, dtype=jnp.int32)
    idx_r = jax.random.randint(key, (R,), 0, N, dtype=jnp.int32)
    perm_p = jax.random.permutation(key, jnp.arange(P, dtype=jnp.int32))
    f32 = jax.random.normal(key, (N, 16), jnp.float32)
    f8 = f32[:, :8]
    f1 = f32[:, :1]
    starts = jnp.sort(jax.random.randint(key, (R,), 0, P, dtype=jnp.int32))
    startsn = jnp.sort(jax.random.randint(key, (N,), 0, R, dtype=jnp.int32))
    vals_p = jax.random.normal(key, (P,), jnp.float32)
    u32 = jnp.arange(P, dtype=jnp.uint32)
    i32r10 = jnp.zeros((R, 10), jnp.int32)
    keys_p = jax.random.randint(key, (P,), 0, 2**30, dtype=jnp.int32)

    timeit("take (N,16) rows @P", lambda s, i: jnp.take(s, i, axis=0), f32, idx_p)
    timeit("take (N,8) rows @P", lambda s, i: jnp.take(s, i, axis=0), f8, idx_p)
    timeit("take (N,1) rows @P", lambda s, i: jnp.take(s, i, axis=0), f1, idx_p)
    timeit("take (N,16) rows @R", lambda s, i: jnp.take(s, i, axis=0), f32, idx_r)
    try:
        timeit(
            "pallas row gather (N,16)@P b512",
            lambda s, i: pallas_row_gather(s, i), f32, idx_p,
        )
    except Exception as e:  # noqa: BLE001 — prototype; the XLA numbers
        # above are the decision data either way.
        print(f"pallas row gather failed: {type(e).__name__}: {e}"[:300],
              flush=True)
    timeit(
        "scatter-add 1col N->R",
        lambda s: jnp.zeros(R, jnp.int32).at[s].add(1, mode="drop"), startsn,
    )
    timeit(
        "scatter-add 1col R->P",
        lambda s: jnp.zeros(P, jnp.int32).at[s].add(1, mode="drop"), starts,
    )
    timeit(
        "scatter-add (R,2)rows->P",
        lambda s: jnp.zeros((P, 2), jnp.int32)
        .at[s]
        .add(jnp.ones((R, 2), jnp.int32), mode="drop"),
        starts,
    )
    timeit("cumsum int32 P", lambda x: jnp.cumsum(x), jnp.ones(P, jnp.int32))
    timeit("cumsum uint32 P", lambda x: jnp.cumsum(x), u32)
    timeit("cumsum (R,10) axis0", lambda x: jnp.cumsum(x, axis=0), i32r10)
    timeit(
        "sort 1 key @P",
        lambda k: lax.sort((k,), num_keys=1, is_stable=False), keys_p,
    )
    timeit(
        "sort 1key+1rider @P",
        lambda k, r: lax.sort((k, r), num_keys=1, is_stable=True),
        keys_p, perm_p,
    )
    timeit(
        "sort 1key+2riders @P",
        lambda k, r: lax.sort((k, r, r), num_keys=1, is_stable=True),
        keys_p, perm_p,
    )
    timeit(
        "sort f32key+1rider @N",
        lambda k, r: lax.sort((k, r), num_keys=1, is_stable=True),
        vals_p[:N], perm_p[:N],
    )

    # Per-grid-step fixed cost of the composite kernels: an all-empty
    # tile_start walks ZERO chunks, so the whole run is grid sequencing +
    # state init + output DMA — the floor a 2-tiles-per-grid-step layout
    # would halve. 1080p/32x32 = 2040 tiles.
    from gsjax.render.pallas_kernels import (
        composite_backward_pallas,
        composite_forward_pallas,
    )

    n_tiles, tiles_x = 2040, 60
    inst = jnp.zeros((16, 1024), jnp.float32)
    ts_empty = jnp.zeros(n_tiles + 1, jnp.int32)
    timeit(
        "fwd kernel, empty stream (fixed/step)",
        lambda i, t: composite_forward_pallas(
            i, t, n_tiles=n_tiles, tiles_x=tiles_x, tile_w=32, tile_h=32,
            chunk=128, strips=1,
        ),
        inst, ts_empty,
    )
    cot = jnp.zeros((n_tiles, 8, 1024), jnp.float32)
    timeit(
        "bwd kernel, empty stream (fixed/step)",
        lambda i, t, c: composite_backward_pallas(
            i, t, c, n_tiles=n_tiles, tiles_x=tiles_x, tile_w=32, tile_h=32,
            chunk=128, strips=1,
        ),
        inst, ts_empty, cot,
    )


if __name__ == "__main__":
    main()
