"""Tile binning: expand depth-ordered (gaussian, tile) instance pairs and
group them per tile for the compositor.

TPU-native re-design of the CUDA rasterizer's duplicateWithKeys + radix-sort
+ identifyTileRanges stages, shaped by what is actually fast on TPU: a
global data movement by index (gather/scatter at instance rate) costs ~7 ns
PER ROW on a v5e chip while a 1-key+1-value `lax.sort` costs ~2.5 ns per
element — so the layout below spends two instance-rate gathers and two
1-key sorts, and nothing else at instance rate:

1. Gaussians are depth-sorted FIRST (N-rate, ~12x smaller than the instance
   stream), making "depth order" == "owner index order" — the CUDA 64-bit
   (tile | depth) radix key degenerates to a STABLE sort on the int32 tile
   key alone. All per-Gaussian binning fields ride ONE packed (N, 8) gather.
2. Expansion is two-level and EXACT: gaussians expand to (gaussian, tile
   row) runs via a boundary-mark scatter + running cumsum, one row-rate
   table gather computes each row's exact tile x-interval — the x-extent of
   the alpha >= 1/255 sublevel ellipse clipped to the row's pixel strip, in
   closed form — and a second mark/cumsum/gather expands rows to instances.
   Unlike the CUDA duplicateWithKeys (bounding-SQUARE rect, typically 2-4x
   overcount), every budgeted instance actually contributes; the budget is
   spent on real work and rendered output is bit-identical (a dropped pair
   fails the compositor's 1/255 skip in every pixel of its tile).
3. Per-tile ranges are raw [start, end) offsets into the sorted stream — NO
   chunk padding. The Pallas kernels mask boundary-chunk lanes instead, and
   the backward accumulates chunks shared between adjacent tiles in a VMEM
   carry block (the TPU grid is sequential, so no races).
4. The backward's per-Gaussian reduction groups the grad stream by owner
   with a stable 1-key rider sort (composite.py); binning only supplies the
   run boundaries, as plain arithmetic on the expansion cumsums (a
   searchsorted over the instance stream costs ~70 ms — log(P) rounds of
   N-rate gathers).

Everything here is integer bookkeeping under stop_gradient; gradients flow
through the separately-gathered float instance data (see composite.py).
"""

from __future__ import annotations

import os

import flax.struct
import jax
import jax.numpy as jnp
from jax import lax

from gsjax.config import RasterConfig
from gsjax.render.pallas_kernels import rank_prefix_pallas

# Kill switch for the fused level-1 row engine (row_engine_pallas): a long
# unattended TPU run must not die on a fresh kernel's Mosaic lowering, so
# tools/engine_smoke.py compiles it on the real chip first and drops this
# sentinel if the compile fails — binning then takes the proven
# rank-kernel + gather path.
ROW_ENGINE = not os.path.exists(
    os.path.join(os.path.dirname(__file__), "..", "..",
                 ".disable_row_engine")
)


@flax.struct.dataclass
class Binning:
    """Instance layout for one frame (all int32 except noted).

    perm: [N] depth order -> original gaussian index.
    sorted_owner: [P] DEPTH-ORDER gaussian index per sorted instance slot;
      N (one past the last row) marks dead/overflow slots.
    sorted_slot: [P] pre-sort (expansion-order) instance index per
      tile-order slot — the tile sort's permutation, ridden out of the sort
      for free. The backward inverts it (one 2-array sort, done THERE so
      forward-only rendering never pays for it) and regroups its
      tile-ordered gradient stream to owner-major order with ONE row-rate
      gather (the expansion order IS owner-major, and gm_start boundaries
      are its offsets) instead of re-sorting the stream with nine f32
      rider rows.
    tile_start: [T+1] instance offsets per tile into the sorted stream
      (tile t owns slots [tile_start[t], tile_start[t+1])).
    gm_start: [N+1] per-owner instance counts as run boundaries: owner o
      owns gm_start[o+1] - gm_start[o] live instances (the backward groups
      the grad stream by owner with a stable rider sort and segment-sums
      runs of these lengths; dead/overflow slots group past gm_start[N]).
    num_instances: [] EXACT pair count over the rows that fit the row
      budget — if this exceeds max_instances the frame overflowed the
      instance budget. NOTE: when num_rows > max_rows, pairs of the dropped
      rows are NOT counted here; consumers must check BOTH counts to decide
      "nothing was dropped" (trainer/_maybe_adapt_budgets and the render CLI
      do).
    num_rows: [] true (unclamped) (gaussian, tile-row) run count — if this
      exceeds max_rows the frame overflowed the row budget.
    """

    perm: jnp.ndarray
    sorted_owner: jnp.ndarray
    sorted_slot: jnp.ndarray
    tile_start: jnp.ndarray
    gm_start: jnp.ndarray
    num_instances: jnp.ndarray
    num_rows: jnp.ndarray


def num_tiles(
    height: int, width: int, tile_w: int, tile_h: int | None = None
) -> tuple[int, int]:
    if tile_h is None:
        tile_h = tile_w
    return -(-width // tile_w), -(-height // tile_h)


def depth_order(depth: jnp.ndarray) -> jnp.ndarray:
    """Stable depth-ascending permutation (ties keep original index order,
    like the CUDA radix sort)."""
    n = depth.shape[0]
    _, perm = lax.sort(
        (lax.stop_gradient(depth), jnp.arange(n, dtype=jnp.int32)),
        num_keys=1,
        is_stable=True,
    )
    return perm


@jax.custom_vjp
def permute_rows(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """`jnp.take(x, perm, axis=0)` for a true permutation `perm`.

    The generic transpose of a row gather is a scatter-add, which XLA
    lowers at ELEMENT rate on TPU (~7 ns/element — 33 ms for the bench
    scene's (500k, 9) cotangent, measured via tools/trace_step.py). A
    permutation's cotangent map is itself a permutation, so the VJP is a
    row-rate gather through the inverse permutation (one extra N-element
    sort, ~2.5 ns/element, to invert)."""
    return jnp.take(x, perm, axis=0)


def _permute_rows_fwd(x, perm):
    return jnp.take(x, perm, axis=0), perm


def _permute_rows_bwd(perm, ct):
    n = perm.shape[0]
    _, inv = lax.sort(
        (perm, jnp.arange(n, dtype=perm.dtype)), num_keys=1, is_stable=True
    )
    return jnp.take(ct, inv, axis=0), None


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


def tile_rect_ext(
    mean_pix: jnp.ndarray,
    ext: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Inclusive-exclusive tile rectangle from per-axis extents, clamped to
    the grid (the CUDA getRect helper, with the tight rect of
    preprocess.Projected.ext). Returns (x0, y0, x1, y1) int32."""
    if tile_h is None:
        tile_h = tile_w
    mp = lax.stop_gradient(mean_pix)
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
    return x0, y0, x1, y1


def _qmin_over_rect(
    dx0: jnp.ndarray,
    dx1: jnp.ndarray,
    dy0: jnp.ndarray,
    dy1: jnp.ndarray,
    ca: jnp.ndarray,
    cb: jnp.ndarray,
    cc: jnp.ndarray,
) -> jnp.ndarray:
    """Minimum of q(d) = ca dx^2 + 2 cb dx dy + cc dy^2 over the axis-aligned
    box [dx0,dx1] x [dy0,dy1] (box given relative to the Gaussian center).

    Convex quadratic over a box: the min is either the unconstrained center
    (0 if inside the box) or on one of the four edges, where the 1D
    restriction minimizes in closed form with a clamp. Used by tests as the
    per-tile cross-check of the row-interval expansion.
    """
    eps = 1e-12
    clampx = lambda v: jnp.clip(v, dx0, dx1)
    clampy = lambda v: jnp.clip(v, dy0, dy1)

    def q(dx, dy):
        return ca * dx * dx + 2.0 * cb * dx * dy + cc * dy * dy

    safe_cc = jnp.maximum(cc, eps)
    safe_ca = jnp.maximum(ca, eps)
    q_left = q(dx0, clampy(-cb * dx0 / safe_cc))
    q_right = q(dx1, clampy(-cb * dx1 / safe_cc))
    q_bot = q(clampx(-cb * dy0 / safe_ca), dy0)
    q_top = q(clampx(-cb * dy1 / safe_ca), dy1)
    edge_min = jnp.minimum(jnp.minimum(q_left, q_right), jnp.minimum(q_bot, q_top))
    inside = (dx0 <= 0.0) & (0.0 <= dx1) & (dy0 <= 0.0) & (0.0 <= dy1)
    return jnp.where(inside, 0.0, edge_min)


def _row_x_interval(
    y0s: jnp.ndarray,
    y1s: jnp.ndarray,
    ca: jnp.ndarray,
    cb: jnp.ndarray,
    cc: jnp.ndarray,
    qmax: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact x-extent of {d : q(d) <= qmax} clipped to the strip
    dy in [y0s, y1s] (all relative to the Gaussian center).

    The clipped region is convex; its x-projection [x_lo, x_hi] is attained
    either at the ellipse's global x-extremes (dy* = -cb x / cc) or on the
    strip edges — clamping dy* and re-solving the 1D quadratic gives the
    closed form. Returns (x_lo, x_hi, nonempty).
    """
    eps = 1e-12
    safe_ca = jnp.maximum(ca, eps)
    safe_cc = jnp.maximum(cc, eps)
    det = jnp.maximum(ca * cc - cb * cb, eps)
    # The ellipse's dy span is [-y_span, y_span]; the feasible dy interval is
    # its intersection with the strip (the x-optima must be clamped INTO it,
    # or the 1D slice below has no real roots).
    y_span = jnp.sqrt(jnp.maximum(qmax * safe_ca / det, 0.0))
    lo_y = jnp.maximum(y0s, -y_span)
    hi_y = jnp.minimum(y1s, y_span)
    nonempty = lo_y <= hi_y
    # Global x extreme of the ellipse and the dy at which it is attained.
    x_star = jnp.sqrt(jnp.maximum(qmax * safe_cc / det, 0.0))
    ys_hi = jnp.clip(-cb * x_star / safe_cc, lo_y, hi_y)
    ys_lo = jnp.clip(cb * x_star / safe_cc, lo_y, hi_y)
    # 1D slice at dy = ys: ca x^2 + 2 cb ys x + (cc ys^2 - qmax) <= 0.
    disc_hi = qmax * safe_ca - det * ys_hi * ys_hi
    disc_lo = qmax * safe_ca - det * ys_lo * ys_lo
    x_hi = (-cb * ys_hi + jnp.sqrt(jnp.maximum(disc_hi, 0.0))) / safe_ca
    x_lo = (-cb * ys_lo - jnp.sqrt(jnp.maximum(disc_lo, 0.0))) / safe_ca
    return x_lo, x_hi, nonempty


# Safety margin on the alpha-threshold level used by the interval cull: the
# conic determinant ca*cc - cb^2 cancels catastrophically in f32 for
# needle-thin splats (the same cancellation the CUDA rasterizer's conic
# inversion carries), which could over-tighten intervals and drop pixels
# with alpha just above 1/255. Keeping borderline instances is always
# output-safe — the compositor's skip mask zeroes them.
CULL_QMAX_MARGIN = 1.05


def _f2i(v: jnp.ndarray) -> jnp.ndarray:
    """Bit-preserving f32 -> int32, so float columns can ride an all-int32
    gather table (one gather per expansion level; a second gather for a
    separate float table would double the latency-bound cost)."""
    return lax.bitcast_convert_type(v, jnp.int32)


def _i2f(v: jnp.ndarray) -> jnp.ndarray:
    return lax.bitcast_convert_type(v, jnp.float32)


def _expand(start: jnp.ndarray, budget: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """owner[s] for each of `budget` slots given exclusive run starts:
    boundary-mark scatter + running cumsum (among equal starts — zero-count
    runs — the max index wins, which is the true owner). Returns (owner,
    slot iota)."""
    s = jnp.arange(budget, dtype=jnp.int32)
    marks = jnp.zeros(budget, jnp.int32).at[start].add(1, mode="drop")
    owner = jnp.cumsum(marks) - 1
    return owner, s


def _expand_packed(
    values: jnp.ndarray, start: jnp.ndarray, budget: int
) -> jnp.ndarray:
    """Expand per-run 32-bit `values[r]` + slot offset into `budget` slots
    WITHOUT the budget-rate table gather: slot p of run r must read
    values[r] + (p - start[r]).

    values[r] - start[r] is constant over run r, so the target is a
    segmented affine sequence: scatter its per-run DELTAS at the run starts
    and take one running cumsum. int32/uint32 addition is exact mod 2^32,
    so the deltas telescope BIT-EXACTLY to values[r] - start[r] at every
    slot — including through zero-length runs, whose deltas land on the
    same position and just accumulate (scatter-add), and through wraparound.
    Cost: one single-column scatter at run rate + one cumsum at budget rate,
    replacing the mark-scatter + cumsum + budget-rate multi-column gather
    (XLA scatters/gathers cost per ELEMENT at instance scale; a (P, 3)
    gather is ~7 ns x 3P while this cumsum streams at full HBM bandwidth).

    Returns uint32 slot values; slots past the last run's end hold garbage
    (callers mask with their own validity predicate, as with _expand).
    """
    u = values.astype(jnp.uint32) - start.astype(jnp.uint32)
    delta = u - jnp.concatenate([jnp.zeros(1, jnp.uint32), u[:-1]])
    acc = jnp.zeros(budget, jnp.uint32).at[start].add(delta, mode="drop")
    return jnp.cumsum(acc) + jnp.arange(budget, dtype=jnp.uint32)


def bin_gaussians(
    mean_pix: jnp.ndarray,
    depth: jnp.ndarray,
    ext: jnp.ndarray,
    conic: jnp.ndarray,
    qmax: jnp.ndarray,
    height: int,
    width: int,
    cfg: RasterConfig,
    packed_paths: bool | None = None,
    perm: jnp.ndarray | None = None,
) -> Binning:
    """Build the depth-sorted, tile-grouped instance layout.

    Args:
      mean_pix: [N,2] continuous pixel centers (gradients stopped here).
      depth: [N] view-space z (sort key; ignored when `perm` is given).
      ext: [N,2] tight pixel extents (0 = skip).
      conic: [N,3] inverse 2D covariance (a, b, c).
      qmax: [N] alpha-threshold level 2 ln(255 op).
      height/width: image dims (static).
      cfg: static rasterizer config.
      packed_paths: None (default) auto-selects the packed uint32
        expansion/sort when the bit budgets fit; False forces the
        gather/3-array-sort fallback (tests pin packed == fallback — the
        fallback is otherwise unreachable below ~2^32 slot-bit scales).
      perm: optional precomputed depth permutation. When given, ALL array
        inputs must already be in depth order — the caller fused this
        permute with its own differentiable-fields permute (render() rides
        both through ONE N-rate (N, 12) row gather instead of two).
    """
    mean_pix = lax.stop_gradient(mean_pix)
    conic = lax.stop_gradient(conic)
    ext = lax.stop_gradient(ext)
    qmax = lax.stop_gradient(qmax)
    n = mean_pix.shape[0]
    tiles_x, tiles_y = num_tiles(height, width, cfg.tw, cfg.th)
    n_tiles = tiles_x * tiles_y
    P = cfg.max_instances
    R = cfg.max_rows
    tsx = float(cfg.tw)
    tsy = float(cfg.th)

    # --- depth-sort gaussians: one packed N-rate permute ---------------------
    if perm is None:
        perm = depth_order(depth)
        packed = jnp.concatenate(
            [mean_pix, conic, ext, qmax[:, None]], axis=-1
        )  # (N, 8)
        packed = jnp.take(packed, perm, axis=0)
        mp = packed[:, 0:2]
        co = packed[:, 2:5]
        ex = packed[:, 5:7]
        qm = packed[:, 7]
    else:
        perm = lax.stop_gradient(perm)
        mp, co, ex, qm = mean_pix, conic, ext, qmax

    x0, y0, x1, y1 = tile_rect_ext(mp, ex, tiles_x, tiles_y, cfg.tw, cfg.th)
    row_counts = y1 - y0  # [N]
    rcum = jnp.cumsum(row_counts)
    rstart = rcum - row_counts
    total_rows = rcum[-1]

    # --- level 1: gaussians -> (gaussian, tile-row) runs ---------------------
    auto = packed_paths is not False
    # Static bit budgets decide the packed level-2 / fused-engine paths.
    bits_tile = max((n_tiles - 1).bit_length(), 1)  # tile values < n_tiles
    bits_g = max((n - 1).bit_length(), 1)  # owner values < n
    bits_p = max((P - 1).bit_length(), 1)  # slot values < P
    bits_tile_s = max(n_tiles.bit_length(), 1)  # sort key incl. sentinel
    if auto and ROW_ENGINE and bits_g + bits_tile <= 32:
        # Fused ROW ENGINE (row_engine_pallas): ONE sequential-grid kernel
        # expands gaussians to rows, selects the 11 per-gaussian columns
        # with an exact one-hot limb contraction (no (R, 10) gather),
        # evaluates the interval closed forms on lanes, and emits the
        # level-2 (istart, delta, dcum) stream directly — replacing the L1
        # rank kernel + budget-rate gather + R-rate math + two R-rate
        # cumsums (~10 ms of separate latency-bound dispatches at bench
        # scale).
        from gsjax.render.pallas_kernels import row_engine_pallas

        table = jnp.stack(
            [
                rstart,
                rcum,
                y0,
                x0,
                x1,
                _f2i(mp[:, 0]),
                _f2i(mp[:, 1]),
                _f2i(co[:, 0]),
                _f2i(co[:, 1]),
                _f2i(co[:, 2]),
                _f2i(qm * CULL_QMAX_MARGIN + 1e-6),
                jnp.arange(n, dtype=jnp.int32),
                jnp.zeros(n, jnp.int32),
                jnp.zeros(n, jnp.int32),
                jnp.zeros(n, jnp.int32),
                jnp.zeros(n, jnp.int32),
            ],
            axis=0,
        )  # (16, N)
        istart_e, delta_e, u_e, total = row_engine_pallas(
            table, rstart, total_rows,
            budget=R, tiles_x=tiles_x, tile_w=cfg.tw, tile_h=cfg.th,
            bits_tile=bits_tile, interpret=cfg.interpret,
        )
        p = jnp.arange(P, dtype=jnp.int32)
        ivalid = p < jnp.minimum(total, P)
        w = rank_prefix_pallas(
            istart_e, delta_e, budget=P, plus_iota=True, dcum=u_e,
            interpret=cfg.interpret,
        )
        g = (w >> bits_tile).astype(jnp.int32)
        tile = (w & jnp.uint32((1 << bits_tile) - 1)).astype(jnp.int32)
        tile = jnp.where(ivalid, tile, n_tiles)  # sentinel sorts last
        g = jnp.where(ivalid, jnp.clip(g, 0, n - 1), n)
        inst_of_row = jnp.concatenate([istart_e, total[None]])  # [R+1]
        return _group_and_finish(
            perm, g, tile, p, inst_of_row, rstart, rcum, total, total_rows,
            n, n_tiles, P, R, bits_tile_s, bits_p, auto,
        )
    if auto:
        # Sorted-run expansion on the MXU (see rank_prefix_pallas): the
        # XLA boundary-mark scatter costs ~10 ns/update — 5.4 ms at bench
        # scale for this level alone. Bit-identical by construction.
        rowner = lax.bitcast_convert_type(
            rank_prefix_pallas(
                rstart, jnp.ones(n, jnp.uint32), budget=R, init=-1,
                interpret=cfg.interpret,
            ),
            jnp.int32,
        )
        r = jnp.arange(R, dtype=jnp.int32)
    else:
        rowner, r = _expand(rstart, R)
    rvalid = r < jnp.minimum(total_rows, R)
    rg = jnp.clip(rowner, 0, n - 1)
    row_table = jnp.stack(
        [
            rstart,
            y0,
            x0,
            x1,
            _f2i(mp[:, 0]),
            _f2i(mp[:, 1]),
            _f2i(co[:, 0]),
            _f2i(co[:, 1]),
            _f2i(co[:, 2]),
            _f2i(qm * CULL_QMAX_MARGIN + 1e-6),
        ],
        axis=-1,
    )  # (N, 10) int32
    rt = jnp.take(row_table, rg, axis=0)  # (R, 10)
    ty = rt[:, 1] + (r - rt[:, 0])
    # Exact x-interval of the alpha>=1/255 ellipse within this row's pixel
    # strip [ty*tsy, ty*tsy + tsy-1], relative to the center (mx, my).
    mx = _i2f(rt[:, 4])
    y0s = ty.astype(jnp.float32) * tsy - _i2f(rt[:, 5])
    x_lo, x_hi, nonempty = _row_x_interval(
        y0s, y0s + (tsy - 1.0),
        _i2f(rt[:, 6]), _i2f(rt[:, 7]), _i2f(rt[:, 8]), _i2f(rt[:, 9]),
    )
    # Tiles tx whose pixel span [tx*tsx, tx*tsx + tsx-1] meets
    # [mx+x_lo, mx+x_hi], clamped to the (already grid-clamped) rect x bounds.
    rx0 = jnp.ceil((mx + x_lo - (tsx - 1.0)) / tsx).astype(jnp.int32)
    rx1 = jnp.floor((mx + x_hi) / tsx).astype(jnp.int32) + 1
    rx0 = jnp.maximum(rx0, rt[:, 2])
    rx1 = jnp.minimum(rx1, rt[:, 3])
    inst_counts = jnp.where(
        rvalid & nonempty, jnp.maximum(rx1 - rx0, 0), 0
    )  # [R]
    tile_base = ty * tiles_x + rx0

    icum = jnp.cumsum(inst_counts)
    istart = icum - inst_counts
    total = icum[-1]

    # --- level 2: rows -> instances (gather fallback: the packed/engine
    # paths returned above) -----------------------------------------------
    p = jnp.arange(P, dtype=jnp.int32)
    ivalid = p < jnp.minimum(total, P)
    iowner, _ = _expand(istart, P)
    ir = jnp.clip(iowner, 0, R - 1)
    inst_table = jnp.stack([istart, tile_base, rg], axis=-1)  # (R, 3)
    it = jnp.take(inst_table, ir, axis=0)  # (P, 3)
    tile = it[:, 1] + (p - it[:, 0])
    g = it[:, 2]
    tile = jnp.where(ivalid, tile, n_tiles)  # sentinel sorts last
    g = jnp.where(ivalid, jnp.clip(g, 0, n - 1), n)
    inst_of_row = jnp.concatenate([istart, icum[-1:]])  # [R+1]
    return _group_and_finish(
        perm, g, tile, p, inst_of_row, rstart, rcum, total, total_rows,
        n, n_tiles, P, R, bits_tile_s, bits_p, auto,
    )


def _group_and_finish(
    perm, g, tile, p, inst_of_row, rstart, rcum, total, total_rows,
    n, n_tiles, P, R, bits_tile_s, bits_p, auto,
) -> Binning:
    """Group the expanded (owner, tile) stream by tile and build run
    boundaries — the shared tail of both expansion paths.

    Stable 1-key sort (depth order rides via owner; the pre-sort slot index
    rides too — the backward inverts it to regroup its gradient stream
    without a nine-f32-rider re-sort). When (tile, slot) fit one word, the
    slot rides the KEY's low bits — a single-array sort with identical
    order (ties break by slot = expansion order = stability) at a third of
    the 3-array cost.
    """
    if auto and bits_tile_s + bits_p <= 32:
        key = (tile.astype(jnp.uint32) << bits_p) | p.astype(jnp.uint32)
        skey, sorted_owner = lax.sort((key, g), num_keys=1, is_stable=False)
        sorted_tile = (skey >> bits_p).astype(jnp.int32)
        sorted_slot = (skey & jnp.uint32((1 << bits_p) - 1)).astype(jnp.int32)
        tile_start = jnp.searchsorted(
            skey,
            jnp.arange(n_tiles + 1, dtype=jnp.uint32) << bits_p,
            side="left",
        ).astype(jnp.int32)
    else:
        sorted_tile, sorted_owner, sorted_slot = lax.sort(
            (tile, g, p), num_keys=1, is_stable=True
        )
        tile_start = jnp.searchsorted(
            sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
        ).astype(jnp.int32)
    sorted_owner = jnp.where(sorted_tile < n_tiles, sorted_owner, n)

    # Gaussian-major run boundaries for the backward: arithmetic on the
    # expansion cumsums — owner o's instances start at the instance offset
    # of its first row (budget-clamped). A searchsorted over the instance
    # stream would cost log(P) rounds of N-rate gathers.
    row_of_owner = jnp.minimum(jnp.concatenate([rstart, rcum[-1:]]), R)
    gm_start = jnp.minimum(
        jnp.take(inst_of_row, row_of_owner), P
    ).astype(jnp.int32)

    return Binning(
        perm=perm,
        sorted_owner=sorted_owner,
        sorted_slot=sorted_slot,
        tile_start=tile_start,
        gm_start=gm_start,
        num_instances=total,
        num_rows=total_rows,
    )
