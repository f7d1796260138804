"""Pallas TPU kernels for tile compositing (the diff-gaussian-rasterization
renderCUDA forward/backward equivalents, redesigned for the TPU memory
hierarchy).

Forward: grid over tiles; each grid step walks its tile's depth-sorted
instance chunks, double-buffering HBM->VMEM DMAs of (ROWS, CHUNK) blocks and
compositing with the vectorized chunk_forward math (pixels on sublanes,
instances on lanes; in-chunk sequential dependence via log-space cumulative
products on the MXU).

Backward: same walk, forward-order replay. Per-instance gradients follow the
closed-form suffix algebra of chunk_backward (no saved per-chunk state; only
the forward's per-tile outputs are consumed) and are DMA'd to a (ROWS, P_PAD)
HBM stream, where each chunk is owned by exactly one tile — no races, no
atomics. The caller segment-sums instance grads to per-Gaussian grads.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsjax.render.common import ROWS, chunk_backward, chunk_forward, tile_pixel_coords


def _fwd_kernel(
    # scalar prefetch
    chunk_start_ref,
    n_chunks_ref,
    # inputs
    inst_hbm,
    # outputs
    color_ref,
    t_ref,
    # scratch
    inst_vmem,
    sems,
    *,
    tiles_x: int,
    tile_size: int,
    chunk: int,
):
    t = pl.program_id(0)
    base = chunk_start_ref[t]
    n = n_chunks_ref[t]
    pix = tile_size * tile_size
    px, py = tile_pixel_coords(t, tiles_x, tile_size)

    def get_dma(slot, j):
        off = (base + j) * chunk
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(off, chunk)], inst_vmem.at[slot], sems.at[slot]
        )

    @pl.when(n > 0)
    def _():
        get_dma(0, 0).start()

    # NOTE: a while_loop with an all-pixels-done early exit was tried here
    # (the CUDA loop's break); Mosaic cannot software-pipeline across
    # while_loop iterations and throughput dropped 3.5x, far outweighing
    # the skipped work. fori_loop + the per-instance `done` masking inside
    # chunk_forward keeps the numerics identical.
    def body(j, carry):
        t_in, done_in, acc = carry
        slot = j % 2

        @pl.when(j + 1 < n)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        inst = inst_vmem[slot]
        t_out, done_out, contrib = chunk_forward(inst, px, py, t_in, done_in)
        return (t_out, done_out, acc + contrib)

    init = (
        jnp.ones((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.float32),
        jnp.zeros((pix, 3), jnp.float32),
    )
    t_fin, _, acc = lax.fori_loop(0, n, body, init)
    color_ref[0] = acc
    t_ref[0] = t_fin


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "tiles_x", "tile_size", "chunk", "interpret")
)
def composite_forward_pallas(
    inst_data: jnp.ndarray,
    chunk_start: jnp.ndarray,
    n_chunks: jnp.ndarray,
    *,
    n_tiles: int,
    tiles_x: int,
    tile_size: int,
    chunk: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tile_color [T, PIX, 3], tile_t [T, PIX, 1])."""
    pix = tile_size * tile_size
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[
            pl.BlockSpec((1, pix, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, pix, 1), lambda i, *_: (i, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, tile_size=tile_size, chunk=chunk
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_tiles, pix, 3), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles, pix, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(chunk_start, n_chunks, inst_data)


def _bwd_kernel(
    # scalar prefetch
    chunk_start_ref,
    n_chunks_ref,
    # inputs
    inst_hbm,
    zeros_hbm,  # aliased to grads_hbm: pre-zeroed for early-exited chunks
    color_ref,
    t_ref,
    d_color_ref,
    d_t_ref,
    # outputs
    grads_hbm,
    # scratch
    inst_vmem,
    grad_vmem,
    read_sems,
    write_sems,
    *,
    tiles_x: int,
    tile_size: int,
    chunk: int,
):
    del zeros_hbm
    t = pl.program_id(0)
    base = chunk_start_ref[t]
    n = n_chunks_ref[t]
    pix = tile_size * tile_size
    px, py = tile_pixel_coords(t, tiles_x, tile_size)

    c_total = color_ref[0]  # (PIX, 3)
    t_final = t_ref[0]  # (PIX, 1)
    d_color = d_color_ref[0]
    d_tfinal = d_t_ref[0]  # (PIX, 1)

    def read_dma(slot, j):
        off = (base + j) * chunk
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(off, chunk)], inst_vmem.at[slot], read_sems.at[slot]
        )

    def write_dma(slot, j):
        off = (base + j) * chunk
        return pltpu.make_async_copy(
            grad_vmem.at[slot], grads_hbm.at[:, pl.ds(off, chunk)], write_sems.at[slot]
        )

    @pl.when(n > 0)
    def _():
        read_dma(0, 0).start()

    # fori (not while-with-early-exit) for cross-iteration pipelining —
    # see the forward kernel's note.
    def body(j, carry):
        t_in, done_in, prefix = carry
        slot = j % 2

        @pl.when(j + 1 < n)
        def _():
            read_dma((j + 1) % 2, j + 1).start()

        read_dma(slot, j).wait()
        # Before overwriting this staging slot, drain its in-flight write.
        @pl.when(j >= 2)
        def _():
            write_dma(slot, j - 2).wait()

        inst = inst_vmem[slot]
        (t_out, done_out, prefix_out), grads = chunk_backward(
            inst, px, py, t_in, done_in, prefix, c_total, t_final, d_color, d_tfinal
        )
        grad_vmem[slot] = grads
        write_dma(slot, j).start()
        return (t_out, done_out, prefix_out)

    init = (
        jnp.ones((pix, 1), jnp.float32),
        jnp.zeros((pix, 1), jnp.float32),
        jnp.zeros((pix, 3), jnp.float32),
    )
    lax.fori_loop(0, n, body, init)

    # Drain outstanding gradient writes.
    @pl.when(n >= 2)
    def _():
        write_dma(n % 2, n - 2).wait()

    @pl.when(n >= 1)
    def _():
        write_dma((n - 1) % 2, n - 1).wait()


@functools.partial(
    jax.jit, static_argnames=("n_tiles", "tiles_x", "tile_size", "chunk", "interpret")
)
def composite_backward_pallas(
    inst_data: jnp.ndarray,
    chunk_start: jnp.ndarray,
    n_chunks: jnp.ndarray,
    tile_color: jnp.ndarray,
    tile_t: jnp.ndarray,
    d_tile_color: jnp.ndarray,
    d_tile_t: jnp.ndarray,
    *,
    n_tiles: int,
    tiles_x: int,
    tile_size: int,
    chunk: int,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns per-instance gradients (ROWS, P_PAD); rows as in common.py."""
    pix = tile_size * tile_size
    p_pad = inst_data.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, pix, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, pix, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, pix, 3), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, pix, 1), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, ROWS, chunk), jnp.float32),
            pltpu.VMEM((2, ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, tile_size=tile_size, chunk=chunk
    )
    # The grad stream is aliased to a zeros input: every chunk belonging to
    # a tile is written by the kernel, but the padded stream's unowned tail
    # slots are not — their rows must read back zero rather than garbage
    # for the caller's segment-sum (sentinel rows are dropped, but keeping
    # the buffer defined costs one cheap memset and removes the hazard).
    zeros = jnp.zeros((ROWS, p_pad), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ROWS, p_pad), jnp.float32)],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(
        chunk_start,
        n_chunks,
        inst_data,
        zeros,
        tile_color,
        tile_t,
        d_tile_color,
        d_tile_t,
    )[0]
