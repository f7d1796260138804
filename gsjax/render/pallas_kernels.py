"""Pallas TPU kernels for tile compositing (the diff-gaussian-rasterization
renderCUDA forward/backward equivalents, redesigned for the TPU memory
hierarchy).

Forward: grid over tiles; each grid step walks the depth-sorted instance
stream chunks overlapping its tile's [start, end) range, with a 4-deep
HBM->VMEM DMA prefetch pipeline of (ROWS, CHUNK) blocks, compositing with
the vectorized chunk_forward math (pixels on sublanes, instances on lanes;
in-chunk sequential dependence via log-space cumulative products on the
MXU), early-terminating per pixel STRIP once every pixel saturates, and
writing per-tile outputs through a manual double-buffered DMA. The stream
is NOT padded to chunk boundaries: range-edge chunks carry foreign
instances which a lane mask zeroes.

Backward: same walk, forward-order replay. Per-instance gradients follow the
closed-form suffix algebra of chunk_backward (no saved per-chunk state; only
the forward's per-tile outputs are consumed) and are DMA'd to a (ROWS, P)
HBM stream. A chunk straddling a tile boundary is produced by SEVERAL grid
steps; because the TPU grid is sequential, a VMEM carry block accumulates
those partial (lane-masked, hence disjoint) contributions and flushes a
chunk only when the walk moves past it — no read-modify-write, no races.
The caller segment-sums instance grads to per-Gaussian grads (see
composite.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gsjax.render.common import (
    ROWS,
    T_EPS,
    chunk_backward,
    chunk_forward,
    chunk_forward_fast,
    moment_basis,
    power_basis,
    tile_pixel_coords,
)


def _chunk_range(i0, i1, chunk):
    """First chunk index and chunk count covering stream range [i0, i1)."""
    c0 = i0 // chunk
    n = jnp.where(i1 > i0, (i1 + chunk - 1) // chunk - c0, 0)
    return c0, n


def _lane_mask(c0, j, i0, i1, chunk):
    """(1, chunk) f32 mask of lanes of chunk c0+j inside [i0, i1)."""
    idx = (c0 + j) * chunk + lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    return jnp.where((idx >= i0) & (idx < i1), 1.0, 0.0)


def _fwd_kernel(
    # scalar prefetch
    tile_start_ref,
    # inputs
    inst_hbm,
    # outputs
    fused_hbm,
    # scratch
    inst_vmem,
    sems,
    out_vmem,
    out_sems,
    *,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
    strips: int,
    fast: bool,
):
    t = pl.program_id(0)
    last_t = pl.num_programs(0) - 1
    i0 = tile_start_ref[t]
    i1 = tile_start_ref[t + 1]
    c0, n = _chunk_range(i0, i1, chunk)
    pix = tile_w * tile_h
    px, py = tile_pixel_coords(t, tiles_x, tile_w, tile_h)
    nbuf = inst_vmem.shape[0]
    sub = pix // strips
    pxs = [px[s * sub:(s + 1) * sub] for s in range(strips)]
    pys = [py[s * sub:(s + 1) * sub] for s in range(strips)]
    pbases = [power_basis(pxs[s], pys[s]) for s in range(strips)]

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds((c0 + j) * chunk, chunk)],
            inst_vmem.at[slot],
            sems.at[slot],
        )

    # Warm-up: fill the prefetch pipeline (nbuf-deep — a single chunk of
    # lookahead leaves the ~HBM-latency-sized bubble per walk that
    # dominates short per-tile ranges).
    for k in range(nbuf - 1):
        @pl.when(k < n)
        def _(k=k):
            get_dma(k, k).start()

    # NOTE: a while_loop with an all-pixels-done early exit was tried here
    # (the CUDA loop's break); Mosaic cannot software-pipeline across
    # while_loop iterations and throughput dropped 3.5x, far outweighing
    # the skipped work. fori_loop + the per-instance `done` masking inside
    # chunk_forward keeps the numerics identical. The CUDA break's work
    # saving is recovered with a scalar-predicated compute skip: once EVERY
    # pixel of a STRIP (pix/strips horizontal band; termination is
    # spatially coherent) has terminated, chunk_forward on that strip is an
    # exact no-op (zero contribution, unchanged T/done), so the strip's
    # math is skipped while the DMA schedule stays static and
    # pipelineable.
    def body(j, carry):
        slot = j % nbuf

        @pl.when(j + nbuf - 1 < n)
        def _():
            get_dma((j + nbuf - 1) % nbuf, j + nbuf - 1).start()

        get_dma(slot, j).wait()
        mask = _lane_mask(c0, j, i0, i1, chunk)
        out = []
        for s in range(strips):
            t_in, done_in, alldone, acc = carry[s]

            if fast:
                # Inference-only: no termination replay — the chunk math is
                # carry-INDEPENDENT (see chunk_forward_fast), leaving just
                # two narrow multiplies on the serial path, and the
                # all-saturated strip skip keys off T directly.
                def compute(op, s=s):
                    t_c, done_c, acc_c = op
                    inst = inst_vmem[slot]
                    decay, contrib_nom = chunk_forward_fast(
                        inst, pxs[s], pys[s], mask, pbasis=pbases[s]
                    )
                    t_out = t_c * decay
                    return (
                        t_out, done_c, jnp.max(t_out) < T_EPS,
                        acc_c + t_c * contrib_nom,
                    )
            else:
                def compute(op, s=s):
                    t_c, done_c, acc_c = op
                    inst = inst_vmem[slot]
                    t_out, done_out, contrib = chunk_forward(
                        inst, pxs[s], pys[s], t_c, done_c, mask,
                        pbasis=pbases[s],
                    )
                    return (
                        t_out, done_out, jnp.min(done_out) >= 0.5,
                        acc_c + contrib,
                    )

            def skip(op):
                t_c, done_c, acc_c = op
                return t_c, done_c, jnp.bool_(True), acc_c

            out.append(lax.cond(alldone, skip, compute, (t_in, done_in, acc)))
        return tuple(out)

    init = tuple(
        (
            jnp.ones((sub, 1), jnp.float32),
            jnp.zeros((sub, 1), jnp.float32),
            jnp.bool_(False),
            jnp.zeros((sub, 3), jnp.float32),
        )
        for _ in range(strips)
    )
    fin = lax.fori_loop(0, n, body, init)
    t_fin = jnp.concatenate([f[0] for f in fin], axis=0)
    acc = jnp.concatenate([f[3] for f in fin], axis=0)

    # Manual double-buffered output DMA: Pallas's automatic output-block
    # pipeline costs ~2.4 us per block per grid step (measured — it does
    # not overlap the copy with the next step's compute under either
    # dimension semantics); staging through VMEM slots and draining at the
    # last step makes the write asynchronous. The output rides TRANSPOSED
    # as (8, PIX) rows [r, g, b, T, pad...] — a lane dim below the 128
    # tiling (PIX-major (PIX, 3)/(PIX, 1) buffers) cannot be DMA-sliced.
    slot = t % 2

    def out_dma(slot, tile):
        return pltpu.make_async_copy(
            out_vmem.at[slot], fused_hbm.at[tile], out_sems.at[slot]
        )

    @pl.when(t >= 2)
    def _():
        out_dma(slot, t).wait()

    out_vmem[slot, 0:3, :] = acc.T
    out_vmem[slot, 3:4, :] = t_fin.T
    out_dma(slot, t).start()

    @pl.when(t == last_t)
    def _():
        out_dma(slot, t).wait()

        @pl.when(t >= 1)
        def _():
            out_dma((t + 1) % 2, t).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tiles", "tiles_x", "tile_w", "tile_h", "chunk", "strips",
        "interpret", "fast",
    ),
)
def composite_forward_pallas(
    inst_data: jnp.ndarray,
    tile_start: jnp.ndarray,
    *,
    n_tiles: int,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
    strips: int = 1,
    interpret: bool = False,
    fast: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (tile_color [T, PIX, 3], tile_t [T, PIX, 1])."""
    pix = tile_w * tile_h
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((4, ROWS, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((2, 8, pix), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
        chunk=chunk, strips=strips, fast=fast,
    )
    fused = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 8, pix), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(tile_start, inst_data)[0]
    # Unpack the transposed fused rows at image rate (XLA fuses these
    # transposes into the caller's untile reshapes).
    tile_color = jnp.swapaxes(fused[:, 0:3, :], 1, 2)  # (T, PIX, 3)
    tile_t = jnp.swapaxes(fused[:, 3:4, :], 1, 2)  # (T, PIX, 1)
    return tile_color, tile_t


def _segsum_kernel(
    # inputs
    lo_ref,  # (1, 1, OB) int32: run starts for this owner block
    hi_ref,  # (1, 1, OB) int32: run ends
    vals_hbm,  # (F, P) ANY
    # outputs
    out_ref,  # (F, OB) block at owner offset
    # scratch
    vals_vmem,  # (2, F, C)
    sems,
    *,
    chunk: int,
    owner_block: int,
):
    lo = lo_ref[0]  # (1, OB)
    hi = hi_ref[0]
    i0 = lo_ref[0, 0, 0]
    i1 = hi_ref[0, 0, owner_block - 1]
    c0 = i0 // chunk
    n = jnp.where(i1 > i0, (i1 + chunk - 1) // chunk - c0, 0)
    f = vals_vmem.shape[1]

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            vals_hbm.at[:, pl.ds((c0 + j) * chunk, chunk)],
            vals_vmem.at[slot],
            sems.at[slot],
        )

    @pl.when(n > 0)
    def _():
        get_dma(0, 0).start()

    row_iota = lax.broadcasted_iota(jnp.int32, (chunk, owner_block), 0)

    def body(j, acc):
        slot = j % 2

        @pl.when(j + 1 < n)
        def _():
            get_dma((j + 1) % 2, j + 1).start()

        get_dma(slot, j).wait()
        vals = vals_vmem[slot]  # (F, C)
        # Ownership by POSITION: slot i belongs to owner bucket b iff
        # i in [lo[b], hi[b]) — no owner stream needed, the sorted runs
        # are delimited by the gm_start window. Exact 0/1 in bf16.
        idx = (c0 + j) * chunk + row_iota  # (C, OB)
        sel = jnp.where((idx >= lo) & (idx < hi), 1.0, 0.0).astype(
            jnp.bfloat16
        )  # (C, OB)
        vhi = vals.astype(jnp.bfloat16)
        vlo = (vals - vhi.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = acc + jnp.dot(vhi, sel, preferred_element_type=jnp.float32)
        acc = acc + jnp.dot(vlo, sel, preferred_element_type=jnp.float32)
        return acc

    out_ref[:] = lax.fori_loop(
        0, n, body, jnp.zeros((f, owner_block), jnp.float32)
    )


@functools.partial(jax.jit, static_argnames=("chunk", "owner_block", "interpret"))
def segment_sum_pallas(
    vals: jnp.ndarray,
    gm_start: jnp.ndarray,
    *,
    chunk: int = 128,
    owner_block: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Per-owner segment sums of an owner-grouped value stream.

    Args:
      vals: (F, P) f32 values (F a multiple of 8), grouped into ascending-
        owner runs along P.
      gm_start: (N+1,) int32 run boundaries: owner o owns slots
        [gm_start[o], gm_start[o+1]).

    Returns:
      (F, N_pad) f32 with column o = sum over owner o's slots (N_pad = N
      rounded up to owner_block; callers slice [:N]).

    Grid over owner blocks: each grid step walks exactly its owners'
    instance range (disjoint by construction — no carries, no write
    hazards) and reduces chunks with a position-range one-hot (C, OB) MXU
    contraction built from the gm_start window alone.

    owner_block=1024 (not 128): the per-grid-step fixed cost (automatic
    output-block pipeline + DMA warm-up bubble) dominates at N/128 steps —
    the one-hot just gets wider columns (MXU-cheap) while the chunk walk
    total is unchanged, so fewer, fatter steps win. At 2M-capacity
    training scale this is 16k -> 2k grid steps.
    """
    f, p = vals.shape
    n = gm_start.shape[0] - 1
    nob = -(-n // owner_block)
    pad = nob * owner_block + 1 - gm_start.shape[0]
    gs = jnp.concatenate(
        [gm_start, jnp.broadcast_to(gm_start[-1:], (pad,))]
    )  # (nob*OB + 1,)
    lo = gs[:-1].reshape(nob, 1, owner_block)
    hi = gs[1:].reshape(nob, 1, owner_block)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nob,),
        in_specs=[
            pl.BlockSpec((1, 1, owner_block), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, owner_block), lambda i: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec((f, owner_block), lambda i: (0, i))],
        scratch_shapes=[
            pltpu.VMEM((2, f, chunk), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _segsum_kernel, chunk=chunk, owner_block=owner_block
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((f, nob * owner_block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(lo, hi, vals)[0]


def _rank_prefix_kernel(
    # scalar prefetch
    kb_ref,  # (NB+1,) int32: run-index range per output block
    base_ref,  # (NB,) int32: prefix over all runs of earlier blocks
    # inputs
    start_hbm,  # (1, R_pad) int32 ANY: sorted run starts (lane-major —
    #            a (R_pad, 1) layout pads dim 1 to the 128-lane tile and
    #            Mosaic rejects the width-1 slice; along lanes every
    #            chunk-wide DMA slice is tile-aligned)
    limbs_hbm,  # (4, R_pad) bf16 ANY: delta 8-bit limbs, LSB first
    # outputs
    out_hbm,  # (1, P_pad) int32 ANY
    # scratch
    start_vmem,  # (nbuf, 1, chunk)
    limbs_vmem,  # (nbuf, 4, chunk)
    sems,  # (nbuf, 2)
    out_vmem,  # (2, 1, block)
    out_sems,  # (2,)
    *,
    block: int,
    chunk: int,
    plus_iota: bool,
):
    c = pl.program_id(0)
    last_c = pl.num_programs(0) - 1
    k0 = kb_ref[c]
    k1 = kb_ref[c + 1]
    c0, n = _chunk_range(k0, k1, chunk)
    nbuf = start_vmem.shape[0]

    def get_dmas(slot, j):
        return (
            pltpu.make_async_copy(
                start_hbm.at[:, pl.ds((c0 + j) * chunk, chunk)],
                start_vmem.at[slot],
                sems.at[slot, 0],
            ),
            pltpu.make_async_copy(
                limbs_hbm.at[:, pl.ds((c0 + j) * chunk, chunk)],
                limbs_vmem.at[slot],
                sems.at[slot, 1],
            ),
        )

    for k in range(nbuf - 1):
        @pl.when(k < n)
        def _(k=k):
            for d in get_dmas(k, k):
                d.start()

    s_row = c * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
    lane_iota = lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(j, acc):
        slot = j % nbuf

        @pl.when(j + nbuf - 1 < n)
        def _():
            for d in get_dmas((j + nbuf - 1) % nbuf, j + nbuf - 1):
                d.start()

        for d in get_dmas(slot, j):
            d.wait()
        idx = (c0 + j) * chunk + lane_iota  # (1, chunk) run index
        start_v = start_vmem[slot]  # (1, chunk)
        # Run r contributes to slot s iff start_r <= s (runs of earlier
        # blocks are folded into base; later runs can't have start <= s).
        # Out-of-range runs get a +inf start in LANE orientation so the
        # only sublane<->lane relayout is this one (chunk, 1) transpose.
        start_g = jnp.where(
            (idx >= k0) & (idx < k1), start_v, jnp.int32(2**31 - 1)
        )  # (1, chunk)
        sel = jnp.where(
            jnp.transpose(start_g) <= s_row, 1.0, 0.0
        ).astype(jnp.bfloat16)  # (chunk, block)
        mm = jnp.dot(
            limbs_vmem[slot], sel, preferred_element_type=jnp.float32
        )  # (4, block); per-limb chunk sums < 128*255 — exact in f32
        return acc + mm.astype(jnp.int32)

    acc = lax.fori_loop(
        0, n, body, jnp.zeros((4, block), jnp.int32)
    )
    out = (
        acc[0:1]
        + (acc[1:2] << 8)
        + (acc[2:3] << 16)
        + (acc[3:4] << 24)  # int32 wrap == uint32 wrap, bit-exact
        + base_ref[c]
    )
    if plus_iota:
        out = out + s_row

    # Manual double-buffered output DMA (see the forward kernel's note on
    # the automatic output pipeline's per-block cost).
    slot = c % 2

    def out_dma(slot, blk):
        return pltpu.make_async_copy(
            out_vmem.at[slot],
            out_hbm.at[:, pl.ds(blk * block, block)],
            out_sems.at[slot],
        )

    @pl.when(c >= 2)
    def _():
        out_dma(slot, c).wait()

    out_vmem[slot] = out
    out_dma(slot, c).start()

    @pl.when(c == last_c)
    def _():
        out_dma(slot, c).wait()

        @pl.when(c >= 1)
        def _():
            out_dma((c + 1) % 2, c).wait()


@functools.partial(
    jax.jit,
    static_argnames=("budget", "block", "chunk", "plus_iota", "init", "interpret"),
)
def rank_prefix_pallas(
    start: jnp.ndarray,
    delta: jnp.ndarray,
    *,
    budget: int,
    block: int = 1024,
    chunk: int = 128,
    plus_iota: bool = False,
    init: int = 0,
    dcum: jnp.ndarray | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """out[s] = init + (s if plus_iota) + sum_{r: start_r <= s} delta_r,
    exact mod 2^32, for every s in [0, budget).

    The TPU-native replacement for binning's scatter-add + running-cumsum
    expansions: XLA lowers a 1-column scatter-add at ~10 ns per UPDATE
    (5.3-5.5 ms each at bench scale — half the binning stage,
    tools/probe_prims.py), but the run starts are already SORTED, so the
    scattered cumsum is a rank computation: partition the output into
    `block`-wide slabs, bucket runs to slabs with one small searchsorted
    (budget/block boundaries), and reduce each slab's runs with a
    (chunk, block) compare one-hot contracted on the MXU against the
    delta's four 8-bit limbs — 0/1 and <256 integers are exact in bf16,
    per-limb chunk sums stay < 2^24 (exact f32), and the int32 limb
    recombination + block prefix wrap exactly like uint32 scatter+cumsum,
    so the result is BIT-IDENTICAL to the XLA path (tests pin this).

    Args:
      start: (R,) int32 sorted ascending run starts; entries >= budget are
        ignored (the XLA path's mode="drop").
      delta: (R,) uint32/int32 per-run deltas (wraparound semantics).
      budget: static output length.
      plus_iota: add `s` to slot s (the packed expansion's slot offset).
      init: static constant added to every slot (e.g. -1 turns the rank
        into the boundary-mark owner index of `_expand`).

    Returns: (budget,) uint32.
    """
    r = start.shape[0]
    r_pad = -(-r // chunk) * chunk
    nb = -(-budget // block)
    p_pad = nb * block
    start_p = jnp.concatenate(
        [start.astype(jnp.int32), jnp.full((r_pad - r,), 2**31 - 1, jnp.int32)]
    )
    d32 = delta.astype(jnp.uint32)
    limbs = jnp.stack(
        [((d32 >> (8 * k)) & 255).astype(jnp.bfloat16) for k in range(4)],
        axis=0,
    )  # (4, R)
    limbs = jnp.pad(limbs, ((0, 0), (0, r_pad - r)))
    if dcum is None:
        dcum = jnp.cumsum(d32)  # R-rate; callers that already hold the
        # telescoped stream (row_engine_pallas's u) pass it instead
    else:
        dcum = dcum.astype(jnp.uint32)
    kb = jnp.searchsorted(
        start_p[:r],
        jnp.arange(0, p_pad + 1, block, dtype=jnp.int32),
        side="left",
    ).astype(jnp.int32)
    base = jnp.where(
        kb[:-1] > 0,
        lax.bitcast_convert_type(
            jnp.take(dcum, jnp.maximum(kb[:-1] - 1, 0)), jnp.int32
        ),
        0,
    ) + jnp.int32(init)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, 1, chunk), jnp.int32),
            pltpu.VMEM((2, 4, chunk), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2, 2)),
            pltpu.VMEM((2, 1, block), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _rank_prefix_kernel, block=block, chunk=chunk, plus_iota=plus_iota
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((1, p_pad), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(kb, base, start_p.reshape(1, r_pad), limbs)[0]
    return lax.bitcast_convert_type(out[0, :budget], jnp.uint32)


def _row_engine_kernel(
    # scalar prefetch
    kb_ref,  # (NB+1,) int32: searchsorted-right of block boundaries into
    #          rstart — block b's gaussians are [max(kb[b]-1, 0), kb[b+1])
    lim_ref,  # (1,) int32: [min(total_rows, R)]
    # inputs
    table_hbm,  # (16, N_pad) int32 ANY: per-gaussian row table (see caller)
    tri_ref,  # (1024, 1024) bf16: lower-triangular INCLUSIVE cumsum mask,
    #           constant block (fetched once)
    # outputs
    out_hbm,  # (4, NB*1024) int32 ANY: [istart, delta, u, pad]
    #          (4 sublanes: Mosaic rejects DMA slices not aligned to the
    #          int32 tiling; 3 rows failed the alignment check)
    tot_ref,  # (1, 128) int32: [num_instances, ...]
    # scratch
    tab_vmem,  # (nbuf, 16, chunk) int32
    sems,
    out_vmem,  # (2, 4, block) int32
    out_sems,
    carry_smem,  # (2,) int32: [running icum, previous row's u]
    *,
    block: int,
    chunk: int,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    bits_tile: int,
):
    b = pl.program_id(0)
    last_b = pl.num_programs(0) - 1
    # Block b's first row may sit INSIDE a run: start from its owner
    # (searchsorted-right minus one); the end bound kb[b+1] is the owner of
    # the NEXT block's first row plus one, which safely includes any run
    # straddling the boundary (ties at empty runs resolve to the true
    # owner because run ranges partition [0, total_rows)).
    g0 = jnp.maximum(kb_ref[b] - 1, 0)
    g1 = kb_ref[b + 1]
    c0, n = _chunk_range(g0, g1, chunk)
    nbuf = tab_vmem.shape[0]
    valid_rows = lim_ref[0]

    @pl.when(b == 0)
    def _():
        carry_smem[0] = 0
        carry_smem[1] = 0

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            table_hbm.at[:, pl.ds((c0 + j) * chunk, chunk)],
            tab_vmem.at[slot],
            sems.at[slot],
        )

    for k in range(nbuf - 1):
        @pl.when(k < n)
        def _(k=k):
            get_dma(k, k).start()

    j_row = b * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
    lane_iota = lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    # Selected table columns (value rows of the one-hot contraction):
    # rstart, y0, x0, x1, mx, my, ca, cb, cc, qmax, g  (11 columns)
    SEL = (0, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)

    def body(j, acc):
        slot = j % nbuf

        @pl.when(j + nbuf - 1 < n)
        def _():
            get_dma((j + nbuf - 1) % nbuf, j + nbuf - 1).start()

        get_dma(slot, j).wait()
        tab = tab_vmem[slot]  # (16, chunk) int32
        gidx = (c0 + j) * chunk + lane_iota
        # Ownership one-hot by POSITION RANGE: gaussian g owns rows
        # [rstart_g, rend_g). Out-of-range chunk lanes get an empty range.
        rs = jnp.where((gidx >= g0) & (gidx < g1), tab[0:1, :], 2**31 - 1)
        re_ = jnp.where((gidx >= g0) & (gidx < g1), tab[1:2, :], 2**31 - 1)
        sel = jnp.where(
            (jnp.transpose(rs) <= j_row) & (j_row < jnp.transpose(re_)),
            1.0, 0.0,
        ).astype(jnp.bfloat16)  # (chunk, block)
        # Each row has EXACTLY ONE owner, so the contraction SELECTS —
        # per-limb sums are single 8-bit values, exact in f32 regardless
        # of chunk width.
        limbs = jnp.concatenate(
            [
                ((tab[r : r + 1, :] >> (8 * k)) & 255).astype(jnp.bfloat16)
                for r in SEL
                for k in range(4)
            ],
            axis=0,
        )  # (44, chunk) bf16
        mm = jnp.dot(limbs, sel, preferred_element_type=jnp.float32)
        return acc + mm

    acc = lax.fori_loop(0, n, body, jnp.zeros((44, block), jnp.float32))
    cols = []
    for i in range(11):
        v = acc[4 * i : 4 * i + 1]
        v1 = acc[4 * i + 1 : 4 * i + 2]
        v2 = acc[4 * i + 2 : 4 * i + 3]
        v3 = acc[4 * i + 3 : 4 * i + 4]
        cols.append(
            v.astype(jnp.int32)
            + (v1.astype(jnp.int32) << 8)
            + (v2.astype(jnp.int32) << 16)
            + (v3.astype(jnp.int32) << 24)
        )
    rstart, y0, x0, x1, mxi, myi, cai, cbi, cci, qmi, g = cols

    f32 = lambda x: lax.bitcast_convert_type(x, jnp.float32)
    tsy = float(tile_h)
    tsx = float(tile_w)
    ty = y0 + (j_row - rstart)
    mx = f32(mxi)
    y0s = ty.astype(jnp.float32) * tsy - f32(myi)
    y1s = y0s + (tsy - 1.0)
    ca, cb, cc, qmax = f32(cai), f32(cbi), f32(cci), f32(qmi)
    # _row_x_interval, inlined (same formulas, same order — the jnp path
    # and this kernel must agree bit-for-bit in interpret mode; on TPU a
    # last-ulp difference only moves an alpha<1/255 instance across a tile
    # boundary, which the compositor's skip mask zeroes either way).
    eps = 1e-12
    safe_ca = jnp.maximum(ca, eps)
    safe_cc = jnp.maximum(cc, eps)
    det = jnp.maximum(ca * cc - cb * cb, eps)
    y_span = jnp.sqrt(jnp.maximum(qmax * safe_ca / det, 0.0))
    lo_y = jnp.maximum(y0s, -y_span)
    hi_y = jnp.minimum(y1s, y_span)
    nonempty = lo_y <= hi_y
    x_star = jnp.sqrt(jnp.maximum(qmax * safe_cc / det, 0.0))
    ys_hi = jnp.clip(-cb * x_star / safe_cc, lo_y, hi_y)
    ys_lo = jnp.clip(cb * x_star / safe_cc, lo_y, hi_y)
    disc_hi = qmax * safe_ca - det * ys_hi * ys_hi
    disc_lo = qmax * safe_ca - det * ys_lo * ys_lo
    x_hi = (-cb * ys_hi + jnp.sqrt(jnp.maximum(disc_hi, 0.0))) / safe_ca
    x_lo = (-cb * ys_lo - jnp.sqrt(jnp.maximum(disc_lo, 0.0))) / safe_ca

    rx0 = jnp.ceil((mx + x_lo - (tsx - 1.0)) / tsx).astype(jnp.int32)
    rx1 = jnp.floor((mx + x_hi) / tsx).astype(jnp.int32) + 1
    rx0 = jnp.maximum(rx0, x0)
    rx1 = jnp.minimum(rx1, x1)
    rvalid = j_row < valid_rows
    counts = jnp.where(
        rvalid & nonempty, jnp.maximum(rx1 - rx0, 0), 0
    )  # (1, block)
    tile_base = ty * tiles_x + rx0

    # Block-local INCLUSIVE cumsum of counts on the MXU (counts <= tiles_x
    # and block sums < 2^24: bf16 inputs, f32 accumulation, exact), plus
    # the running carry from earlier blocks.
    icum = jnp.dot(
        counts.astype(jnp.bfloat16), tri_ref[...],
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32) + carry_smem[0]
    istart = icum - counts

    # Level-2 packed stream prep: u = ((g << bits_tile) | tile_base) -
    # istart, delta = u - u_prev (uint32 wraparound; prev carried in SMEM).
    packed_w = (g << bits_tile) | tile_base
    u = lax.bitcast_convert_type(
        packed_w.astype(jnp.uint32)
        - lax.bitcast_convert_type(istart, jnp.uint32),
        jnp.int32,
    )
    # Shift u right by one lane: roll then patch lane 0 with the carry.
    u_prev = pltpu.roll(u, 1, 1)
    u_prev = jnp.where(
        lax.broadcasted_iota(jnp.int32, (1, block), 1) == 0,
        carry_smem[1],
        u_prev,
    )
    delta = lax.bitcast_convert_type(
        lax.bitcast_convert_type(u, jnp.uint32)
        - lax.bitcast_convert_type(u_prev, jnp.uint32),
        jnp.int32,
    )
    carry_smem[0] = icum[0, block - 1]
    carry_smem[1] = u[0, block - 1]

    # Manual double-buffered output DMA (see the forward kernel's note).
    slot = b % 2

    def out_dma(slot, blk):
        return pltpu.make_async_copy(
            out_vmem.at[slot],
            out_hbm.at[:, pl.ds(blk * block, block)],
            out_sems.at[slot],
        )

    @pl.when(b >= 2)
    def _():
        out_dma(slot, b).wait()

    out_vmem[slot, 0:1, :] = istart
    out_vmem[slot, 1:2, :] = delta
    # u telescopes delta exactly (mod 2^32): it IS the cumsum-of-deltas the
    # level-2 rank kernel's host prep would otherwise recompute at R rate.
    out_vmem[slot, 2:3, :] = u
    out_dma(slot, b).start()

    @pl.when(b == last_b)
    def _():
        # Vector store: Mosaic rejects scalar stores to VMEM refs.
        tot_ref[0:1, :] = jnp.full((1, 128), carry_smem[0], jnp.int32)
        out_dma(slot, b).wait()

        @pl.when(b >= 1)
        def _():
            out_dma((b + 1) % 2, b).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "budget", "block", "chunk", "tiles_x", "tile_w", "tile_h",
        "bits_tile", "interpret",
    ),
)
def row_engine_pallas(
    table: jnp.ndarray,
    rstart_1d: jnp.ndarray,
    total_rows: jnp.ndarray,
    *,
    budget: int,
    block: int = 1024,
    chunk: int = 128,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    bits_tile: int,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused level-1 binning: expand gaussians to (gaussian, tile-row) runs
    AND evaluate each row's exact tile x-interval in ONE sequential-grid
    kernel, replacing four budget-rate XLA stages (the L1 rank kernel, the
    (R, 10) row-table gather, the R-rate interval math, and the instance
    cumsum — ~10 ms at bench scale, each latency-bound as a separate
    primitive dispatch).

    Per output row block the kernel walks its gaussians' CONTIGUOUS table
    chunks (rows of gaussian g are [rstart_g, rend_g) — no gather), selects
    all 11 needed columns with one (44, chunk) x (chunk, block) one-hot
    limb contraction (each row has exactly ONE owner, so per-limb sums are
    selections — bit-exact for arbitrary int32/f32-bitcast payloads), runs
    the closed-form interval math on lanes, and threads the instance-count
    cumsum and the level-2 packed-delta chain through SMEM across the
    sequential grid.

    Args:
      table: (16, N) int32, rows [rstart, rend, y0, x0, x1, f2i(mx),
        f2i(my), f2i(ca), f2i(cb), f2i(cc), f2i(qmax'), g, 0...].
      rstart_1d: (N,) int32 sorted run starts (for the block bucketing).
      total_rows: [] int32 true (unclamped) run count.
      budget: static R (max_rows). Callers must also ensure the level-2
        bit packing fits (bits_g + bits_tile <= 32) — the non-fitting case
        takes the gather fallback, which this kernel does not serve.

    Returns (istart [R], delta [R], u [R] int32, num_instances [] int32) —
    u = cumsum(delta) mod 2^32 (rank_prefix_pallas's dcum, precomputed).
    """
    nb = -(-budget // block)
    r_pad = nb * block
    npad = -(-table.shape[1] // chunk) * chunk
    table_p = jnp.pad(table, ((0, 0), (0, npad - table.shape[1])))
    # Dead-pad gaussians: empty row ranges (rstart=rend=INT_MAX).
    if npad > table.shape[1]:
        pad_cols = jnp.arange(npad, dtype=jnp.int32) >= table.shape[1]
        big = jnp.int32(2**31 - 1)
        table_p = jnp.where(
            pad_cols[None, :]
            & (jnp.arange(16, dtype=jnp.int32) < 2)[:, None],
            big,
            table_p,
        )
    kb = jnp.searchsorted(
        rstart_1d,
        jnp.arange(0, r_pad + 1, block, dtype=jnp.int32),
        side="right",
    ).astype(jnp.int32)
    lim = jnp.minimum(total_rows, budget).astype(jnp.int32).reshape(1)
    rows = lax.broadcasted_iota(jnp.int32, (block, block), 0)
    cols_i = lax.broadcasted_iota(jnp.int32, (block, block), 1)
    tri = jnp.where(rows <= cols_i, 1.0, 0.0).astype(jnp.bfloat16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((block, block), lambda i, *_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 128), lambda i, *_: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((4, 16, chunk), jnp.int32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((2, 4, block), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _row_engine_kernel, block=block, chunk=chunk, tiles_x=tiles_x,
        tile_w=tile_w, tile_h=tile_h, bits_tile=bits_tile,
    )
    out, tot = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((4, r_pad), jnp.int32),
            jax.ShapeDtypeStruct((1, 128), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(kb, lim, table_p, tri)
    return out[0, :budget], out[1, :budget], out[2, :budget], tot[0, 0]


def _bwd_kernel(
    # scalar prefetch
    tile_start_ref,
    # inputs
    inst_hbm,
    zeros_hbm,  # aliased to grads_hbm: pre-zeroed for never-walked chunks
    cot_ref,  # (1, 8, PIX) fused per-pixel cotangents
    # outputs
    grads_hbm,
    # scratch
    inst_vmem,
    carry_vmem,
    read_sems,
    write_sems,
    carry_smem,
    *,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
    strips: int,
):
    del zeros_hbm
    t = pl.program_id(0)
    last_t = pl.num_programs(0) - 1
    i0 = tile_start_ref[t]
    i1 = tile_start_ref[t + 1]
    c0, n = _chunk_range(i0, i1, chunk)
    px, py = tile_pixel_coords(t, tiles_x, tile_w, tile_h)
    pix = tile_w * tile_h
    sub = pix // strips
    pxs = [px[s * sub:(s + 1) * sub] for s in range(strips)]
    pys = [py[s * sub:(s + 1) * sub] for s in range(strips)]
    bases = [moment_basis(pxs[s], pys[s]) for s in range(strips)]
    pbases = [power_basis(pxs[s], pys[s]) for s in range(strips)]

    # carry_smem: [0] = chunk index held in the active carry slot (-1 none);
    #             [1] = flush counter. The carry block is double-buffered
    #             and DMA'd to HBM IN PLACE (slot = count % 2): accumulation
    #             epoch k writes slot k%2 while epoch k-1's flush drains
    #             from the other slot — no staging copy per flush.
    @pl.when(t == 0)
    def _():
        carry_smem[0] = -1
        carry_smem[1] = 0

    # Per-pixel cotangents ride TRANSPOSED as (8, PIX) rows
    # [dC_r, dC_g, dC_b, A'_0, pad...] — the same fused layout as the
    # forward's output DMA. Per-pixel-minor (PIX, 1)/(PIX, 3) input blocks
    # force 128-lane padding (128x/42x HBM traffic, ~1 GB per step at
    # 1080p/32x32 measured in the xplane trace); the fused rows are exact.
    # The (rows, PIX) -> (PIX, rows) transposes below happen once per TILE
    # (not per chunk) and their cost is per-grid-step noise.
    cot = cot_ref[0]  # (8, PIX)
    d_colors_t = [
        cot[0:3, s * sub:(s + 1) * sub].T for s in range(strips)
    ]  # (sub, 3) each
    suffix0s = [
        cot[3:4, s * sub:(s + 1) * sub].T for s in range(strips)
    ]  # (sub, 1) each

    nbuf = inst_vmem.shape[0]

    def read_dma(slot, j):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds((c0 + j) * chunk, chunk)],
            inst_vmem.at[slot],
            read_sems.at[slot],
        )

    def write_dma(slot, chunk_idx):
        return pltpu.make_async_copy(
            carry_vmem.at[slot],
            grads_hbm.at[:, pl.ds(chunk_idx * chunk, chunk)],
            write_sems.at[slot],
        )

    def flush_carry():
        """DMA the active carry slot to its chunk's stream slot and rotate.

        The NEXT accumulation epoch's slot ((count+1) % 2) may still have
        its own flush (count-1) in flight; that wait happens at the first
        write of the new epoch (see body)."""
        count = carry_smem[1]
        write_dma(count % 2, carry_smem[0]).start()
        carry_smem[1] = count + 1

    # Warm-up: fill the nbuf-deep prefetch pipeline (see forward kernel).
    for k in range(nbuf - 1):
        @pl.when(k < n)
        def _(k=k):
            read_dma(k, k).start()

    # fori (not while-with-early-exit) for cross-iteration pipelining —
    # see the forward kernel's note. Once every pixel of a STRIP has
    # terminated in the replay, the strip's remaining chunks produce
    # exactly zero grads and unchanged replay state, so its compute is
    # skipped; when EVERY strip is done the carry update is skipped too
    # (the grad stream is pre-zeroed via the aliased zeros input, and a
    # neighbouring tile that shares the chunk contributes independently).
    def body(j, carry):
        slot = j % nbuf
        chunk_idx = c0 + j

        @pl.when(j + nbuf - 1 < n)
        def _():
            read_dma((j + nbuf - 1) % nbuf, j + nbuf - 1).start()

        read_dma(slot, j).wait()
        mask = _lane_mask(c0, j, i0, i1, chunk)
        out = []
        grads = None
        any_live = jnp.bool_(False)
        for s in range(strips):
            t_in, done_in, suffix, alldone = carry[s]
            any_live = any_live | jnp.logical_not(alldone)

            def compute(op, s=s):
                t_c, done_c, suffix_c = op
                inst = inst_vmem[slot]
                (t_out, done_out, suffix_out), g = chunk_backward(
                    inst, pxs[s], pys[s], t_c, done_c, suffix_c,
                    d_colors_t[s], mask, bases[s], pbasis=pbases[s],
                )
                return (
                    (t_out, done_out, suffix_out, jnp.min(done_out) >= 0.5),
                    g,
                )

            def skip(op):
                t_c, done_c, suffix_c = op
                return (
                    (t_c, done_c, suffix_c, jnp.bool_(True)),
                    jnp.zeros((ROWS, chunk), jnp.float32),
                )

            st, g = lax.cond(alldone, skip, compute, (t_in, done_in, suffix))
            out.append(st)
            grads = g if grads is None else grads + g

        held = carry_smem[0]

        @pl.when(any_live & (chunk_idx == held))
        def _():
            slot = carry_smem[1] % 2
            carry_vmem[slot] = carry_vmem[slot] + grads

        @pl.when(any_live & (chunk_idx != held))
        def _():
            @pl.when(held >= 0)
            def _():
                flush_carry()

            count = carry_smem[1]

            # The new epoch's slot was last used by flush count-2; wait for
            # that DMA before overwriting it.
            @pl.when(count >= 2)
            def _():
                write_dma(count % 2, 0).wait()  # chunk idx irrelevant

            carry_vmem[count % 2] = grads
            carry_smem[0] = chunk_idx

        return tuple(out)

    init = tuple(
        (
            jnp.ones((sub, 1), jnp.float32),
            jnp.zeros((sub, 1), jnp.float32),
            suffix0s[s],
            jnp.bool_(False),
        )
        for s in range(strips)
    )
    lax.fori_loop(0, n, body, init)

    # Final grid step: flush the last held chunk and drain all writes.
    @pl.when(t == last_t)
    def _():
        @pl.when(carry_smem[0] >= 0)
        def _():
            flush_carry()

        count = carry_smem[1]

        @pl.when(count >= 2)
        def _():
            write_dma(count % 2, 0).wait()

        @pl.when(count >= 1)
        def _():
            write_dma((count - 1) % 2, 0).wait()


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_tiles", "tiles_x", "tile_w", "tile_h", "chunk", "strips",
        "interpret",
    ),
)
def composite_backward_pallas(
    inst_data: jnp.ndarray,
    tile_start: jnp.ndarray,
    cot: jnp.ndarray,
    *,
    n_tiles: int,
    tiles_x: int,
    tile_w: int,
    tile_h: int,
    chunk: int,
    strips: int = 1,
    interpret: bool = False,
) -> jnp.ndarray:
    """Returns per-instance gradients (ROWS, P); rows as in common.py.

    Args:
      cot: [T, 8, PIX] fused per-pixel cotangents, rows
        [dC_r, dC_g, dC_b, A'_0, 0, 0, 0, 0] where A'_0 is the per-tile
        initial suffix (see chunk_backward):
        sum_ch dC_ch * C_total_ch + dT_final * T_final, computed at image
        rate by the caller. The transposed-rows layout mirrors the forward
        output DMA: PIX on lanes (exact), not on sublanes with a 1- or
        3-wide lane dim (which HBM tiling pads to 128 lanes).
    """
    pix = tile_w * tile_h
    p = inst_data.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 8, pix), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((4, ROWS, chunk), jnp.float32),  # read slots
            pltpu.VMEM((2, ROWS, chunk), jnp.float32),  # carry (DMA'd in place)
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SMEM((2,), jnp.int32),
        ],
    )
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, tile_w=tile_w, tile_h=tile_h,
        chunk=chunk, strips=strips,
    )
    # The grad stream is aliased to a zeros input: chunks past the live
    # stream (dead/sentinel slots) are never walked by any tile and must
    # read back zero for the caller's segment-sum.
    zeros = jnp.zeros((ROWS, p), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((ROWS, p), jnp.float32)],
        input_output_aliases={2: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
        ),
        interpret=interpret,
    )(
        tile_start,
        inst_data,
        zeros,
        cot,
    )[0]
