"""Shared compositing math for the tiled rasterizer.

One canonical implementation of the per-chunk front-to-back alpha
compositing used by BOTH the pure-JAX fallback compositor (CPU tests,
autodiff oracle) and the Pallas TPU kernels — so the two paths are
numerically identical by construction.

Semantics mirror the CUDA renderCUDA loop (see gsjax/render/oracle.py for
the constants' provenance). Design notes:

* Compute layout: (PIX, K) — pixels on the sublane axis (tile_size^2 = 256),
  instances on the lane axis (chunk = 128). Instance fields arrive as (1, K)
  row slices of a (ROWS, K) block.
* The instance stream is depth-sorted but NOT padded to per-tile chunk
  boundaries; a chunk at a tile-range boundary carries foreign instances.
  Every entry point takes a `lane_mask` (1, K) that zeroes them — folded
  into the skip mask so foreign lanes produce no contribution, no
  transmittance change, and (in the backward) exactly zero gradients.
* The sequential front-to-back dependence within a chunk is vectorized with
  cumulative products in log space; `log(1 - alpha)` is safe because alpha
  is capped at 0.99. Cumulative sums are expressed as triangular matmuls —
  guaranteed lowerable in Pallas/Mosaic and MXU-fast.
* Lane reductions (color accumulation, transmittance products) run on the
  MXU as (PIX, K) x (K, c) contractions with bf16 hi/lo splits — a VPU
  cross-lane reduction tree costs ~7 passes each and dominated the kernel.
* Early-termination (`done`) masks are carried explicitly per pixel: a
  contribution that would push T below 1e-4 is skipped and the pixel never
  resumes, exactly like the CUDA persistent `done` flag.
* The 0.99 alpha cap uses a straight-through gradient (CUDA convention).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax

# Instance-stream row indices (the HBM layout is [ROWS, P]).
ROW_MX = 0  # mean x, continuous pixels
ROW_MY = 1  # mean y
ROW_CA = 2  # conic a (xx)
ROW_CB = 3  # conic b (xy)
ROW_CC = 4  # conic c (yy)
ROW_R = 5  # color r
ROW_G = 6  # color g
ROW_B = 7  # color b
ROW_OP = 8  # opacity (activated)
N_FIELDS = 9
ROWS = 16  # padded to a multiple of 8 sublanes

ALPHA_CAP = 0.99
ALPHA_SKIP = 1.0 / 255.0
T_EPS = 1e-4

# A/B switch for chunk_alpha's exponent evaluation: the (PIX, 36) x (36, K)
# MXU quadratic-form (True) vs the ~9-pass elementwise VPU chain (False).
# Measured on the r5 bench (1080p/500k, artifacts/tpu_queue_r5): the MXU
# form is ~3 ms SLOWER per kernel (fwd 26.6 -> 29.6 ms) — the chunk walk is
# bound by its carry-dependent serial chain, not by the power assembly's
# VPU passes, so adding a matmul+staging to the chain only lengthens it.
# Kept switchable for kernel ablations (tools/ablate_kernels).
POWER_VIA_MXU = False


def _hi_lo(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """bf16 split recovering ~f32 accuracy through MXU contractions."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _tri_cumsum(x: jnp.ndarray, exclusive: bool, exact_input: bool = False) -> jnp.ndarray:
    """Cumulative sum along the LAST (lane) axis via a triangular matmul.

    x: (PIX, K). Returns (PIX, K). Uses the MXU. TPU matmuls truncate f32
    inputs to bf16 by default, so general inputs are split into bf16 hi+lo
    halves (the 0/1 triangular mask is exact in bf16, and the MXU
    accumulates in f32) — two full-speed matmuls recover ~f32 accuracy.
    Pass exact_input=True for inputs already exactly representable in bf16
    (e.g. 0/1 flags) to use a single matmul.
    """
    k = x.shape[-1]
    rows = lax.broadcasted_iota(jnp.int32, (k, k), 0)
    cols = lax.broadcasted_iota(jnp.int32, (k, k), 1)
    # Select in f32 first: Mosaic cannot relayout an i1 mask straight into
    # the bf16 (16,128) tiling.
    tri = jnp.where(rows < cols if exclusive else rows <= cols, 1.0, 0.0).astype(
        jnp.bfloat16
    )
    hi = x.astype(jnp.bfloat16)
    out = jnp.dot(hi, tri, preferred_element_type=jnp.float32)
    if not exact_input:
        lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        out = out + jnp.dot(lo, tri, preferred_element_type=jnp.float32)
    return out


def _weighted_color_sums(
    w: jnp.ndarray, c3: jnp.ndarray, lgl: jnp.ndarray, fast: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """sum_k w[p,k]*c3[ch,k] (PIX,3) and sum_k lgl[p,k] (PIX,1), one MXU
    launch.

    The color sum is a plain (PIX,K) x (K,3) contraction with the color
    matrix itself as the RHS — instead of forming w*c per channel on the
    VPU and reducing against a 0/1 selector, the hi/lo products
    w_hi*c_hi + w_hi*c_lo + w_lo*c_hi land in separate RHS column blocks
    (w_lo*c_lo ~ 2^-32 is dropped). The lane sum of lgl rides as a 7th
    column against a ones block. VPU cost is just the two hi/lo splits;
    everything else is row-rate RHS assembly.

    fast=True keeps only the hi halves (half-width LHS/RHS — half the MXU
    cost) at bf16 accuracy; see chunk_forward.
    """
    k = w.shape[-1]
    w_hi, w_lo = _hi_lo(w)
    l_hi, l_lo = _hi_lo(lgl)
    c_hi, c_lo = _hi_lo(c3)
    zc = jnp.zeros((k, 3), jnp.bfloat16)
    z1 = jnp.zeros((k, 1), jnp.bfloat16)
    o1 = jnp.ones((k, 1), jnp.bfloat16)
    if fast:
        lhs = jnp.concatenate([w_hi, l_hi], axis=-1)  # (PIX, 2K)
        rhs = jnp.concatenate(
            [
                jnp.concatenate([c_hi.T, z1], axis=-1),  # w_hi rows
                jnp.concatenate([zc, o1], axis=-1),  # l_hi rows
            ],
            axis=0,
        )  # (2K, 4)
        m = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
        return m[:, :3], m[:, 3:4]
    lhs = jnp.concatenate([w_hi, w_lo, l_hi, l_lo], axis=-1)  # (PIX, 4K)
    rhs = jnp.concatenate(
        [
            jnp.concatenate([c_hi.T, c_lo.T, z1], axis=-1),  # w_hi rows
            jnp.concatenate([c_hi.T, zc, z1], axis=-1),  # w_lo rows
            jnp.concatenate([zc, zc, o1], axis=-1),  # l_hi rows
            jnp.concatenate([zc, zc, o1], axis=-1),  # l_lo rows
        ],
        axis=0,
    )  # (4K, 7)
    m = jnp.dot(lhs, rhs, preferred_element_type=jnp.float32)
    return m[:, :3] + m[:, 3:6], m[:, 6:7]


def power_basis(
    px: jnp.ndarray, py: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Tile-constant pixel basis for the MXU power evaluation.

    Returns ((PIX, 36) bf16, cx, cy): the degree-2 monomial columns
    [1, x, y, x^2, xy, y^2] in tile-CENTERED coordinates, hi/lo split (the
    split is exact for every supported tile width — see moment_basis) and
    replicated three times to pair with the three bf16 coefficient limbs of
    `chunk_alpha`'s RHS. The 36-wide contraction pads to one 128-deep MXU
    pass either way, so the replication and the third limb are free.
    Compute ONCE per tile: the basis is chunk-invariant.
    """
    cx = 0.5 * (jnp.max(px) + jnp.min(px))
    cy = 0.5 * (jnp.max(py) + jnp.min(py))
    pxc = px - cx  # (PIX, 1)
    pyc = py - cy
    b = jnp.concatenate(
        [jnp.ones_like(pxc), pxc, pyc, pxc * pxc, pxc * pyc, pyc * pyc],
        axis=1,
    )  # (PIX, 6) f32
    b_hi, b_lo = _hi_lo(b)
    return (
        jnp.concatenate([b_hi, b_hi, b_hi, b_lo, b_lo, b_lo], axis=1),
        cx,
        cy,
    )


def _power_coeffs(inst: jnp.ndarray, cx, cy) -> jnp.ndarray:
    """(36, K) bf16 RHS of the power matmul: three bf16 limbs (~25 mantissa
    bits) of the six per-instance quadratic coefficients, repeated for the
    basis' hi and lo halves. Row-rate (1, K) arithmetic — the expansion of
      power = -0.5 ca dx^2 - cb dx dy - 0.5 cc dy^2,  dx = (mx-cx) - x'
    around the tile center, so coefficient magnitudes stay O(qmax) and the
    limb truncation error in power is ~|power| * 2^-25."""
    mx = inst[ROW_MX : ROW_MX + 1, :]
    my = inst[ROW_MY : ROW_MY + 1, :]
    ca = inst[ROW_CA : ROW_CA + 1, :]
    cb = inst[ROW_CB : ROW_CB + 1, :]
    cc = inst[ROW_CC : ROW_CC + 1, :]
    u = mx - cx  # (1, K) centered mean
    v = my - cy
    coef = jnp.concatenate(
        [
            -0.5 * (ca * u * u + cc * v * v) - cb * u * v,
            ca * u + cb * v,
            cc * v + cb * u,
            -0.5 * ca,
            -cb,
            -0.5 * cc,
        ],
        axis=0,
    )  # (6, K) f32
    l1 = coef.astype(jnp.bfloat16)
    r1 = coef - l1.astype(jnp.float32)
    l2 = r1.astype(jnp.bfloat16)
    l3 = (r1 - l2.astype(jnp.float32)).astype(jnp.bfloat16)
    limbs = jnp.concatenate([l1, l2, l3], axis=0)  # (18, K)
    return jnp.concatenate([limbs, limbs], axis=0)  # (36, K)


def chunk_alpha(
    inst: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    lane_mask: jnp.ndarray,
    pbasis: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per (pixel, instance) alpha for one chunk.

    The quadratic exponent is evaluated as ONE (PIX, 36) x (36, K) MXU
    contraction against the tile-centered monomial basis instead of ~9
    (PIX, K) VPU passes (dx/dy/power assembly) — the compositing kernels
    are VPU-bound at chunk rate, and the limb split keeps the result within
    ~2^-25 relative of the f32 elementwise path.

    Args:
      inst: (ROWS, K) instance fields.
      px, py: (PIX, 1) pixel coordinates.
      lane_mask: (1, K) f32 0/1 — 0 for lanes outside this tile's range.
      pbasis: optional precomputed power_basis(px, py) (hoist per tile).

    Returns:
      alpha: (PIX, K) capped, skip-masked alpha (straight-through cap grad).
      G: (PIX, K) the Gaussian falloff exp(power) (for opacity gradients).
      keep: (PIX, K) f32 0/1 skip mask (stop-gradient; includes lane_mask).
    """
    op = inst[ROW_OP : ROW_OP + 1, :]
    if POWER_VIA_MXU:
        if pbasis is None:
            pbasis = power_basis(px, py)
        pb, cx, cy = pbasis
        power = jnp.dot(
            pb, _power_coeffs(inst, cx, cy),
            preferred_element_type=jnp.float32,
        )  # (PIX, K)
    else:
        mx = inst[ROW_MX : ROW_MX + 1, :]
        my = inst[ROW_MY : ROW_MY + 1, :]
        ca = inst[ROW_CA : ROW_CA + 1, :]
        cb = inst[ROW_CB : ROW_CB + 1, :]
        cc = inst[ROW_CC : ROW_CC + 1, :]
        dx = mx - px  # (PIX, K)
        dy = my - py
        power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    G = jnp.exp(jnp.minimum(power, 0.0))
    raw = op * G
    # No AD ever passes through kernel math (composite is a custom_vjp and
    # the twin is forward-only), so the cap is a plain min — the oracle
    # carries the straight-through-gradient version of this clamp.
    capped = jnp.minimum(ALPHA_CAP, raw)
    keep = jnp.where((capped >= ALPHA_SKIP) & (power <= 0.0), lane_mask, 0.0)
    return capped * keep, G, keep


def chunk_forward(
    inst: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    t_in: jnp.ndarray,
    done_in: jnp.ndarray,
    lane_mask: jnp.ndarray,
    fast: bool = False,
    pbasis: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite one chunk of depth-ordered instances into a tile.

    Args:
      inst: (ROWS, K) instance fields.
      px, py: (PIX, 1) pixel coordinates.
      t_in: (PIX, 1) transmittance entering the chunk.
      done_in: (PIX, 1) f32 0/1 — pixel already terminated.
      lane_mask: (1, K) f32 0/1 range mask.
      fast: drop the bf16 lo-half corrections of the MXU cumsums (the
        per-chunk cost floor is the triangular matmuls; the lo halves are
        half of them). Transmittance error is bounded by the bf16 rounding
        of log(1-alpha) accumulated over live instances — ~1e-3 relative on
        typical scenes, invisible in 8-bit display output. INFERENCE-ONLY:
        the backward replays with exact math, so training with fast=True
        would make the suffix algebra inconsistent with the forward.

    Returns:
      t_out: (PIX, 1), done_out: (PIX, 1), contrib: (PIX, 3) premultiplied
      color added by this chunk (background NOT composited here).
    """
    alpha, _, _ = chunk_alpha(inst, px, py, lane_mask, pbasis=pbasis)
    lg = jnp.log1p(-alpha)  # <= 0; alpha <= 0.99 keeps this finite
    cum_excl = _tri_cumsum(lg, exclusive=True, exact_input=fast)
    e_excl = jnp.exp(cum_excl)  # (PIX, K) unmasked T decay before k
    t_before = t_in * e_excl
    w_pre = alpha * t_before  # pre-mask contribution weights
    # Termination: the contribution that would push T below eps is itself
    # skipped, and the pixel stays done forever. T after k is
    # t_in * exp(cum_incl_k) = t_in * F_k with F_k = e_excl_k * (1-alpha_k).
    # F is NONINCREASING in k (each factor <= 1) and only decreases at
    # alpha > 0 lanes, and the skipped-contribution rule keeps t_in >= eps
    # for every non-done pixel — so "some j <= k fired" collapses to ONE
    # compare against F_k, with no cumsum on the carry-dependent path
    # (replaces a (K, K) MXU pass per chunk in both kernels).
    f_incl = e_excl * (1.0 - alpha)
    skip = jnp.minimum(
        done_in + jnp.where(t_in * f_incl < T_EPS, 1.0, 0.0), 1.0
    )
    live = 1.0 - skip  # (PIX, K)
    w = w_pre * live
    c3 = inst[ROW_R : ROW_B + 1, :]  # (3, K)
    contrib, lg_sum = _weighted_color_sums(w, c3, lg * live, fast=fast)
    t_out = t_in * jnp.exp(lg_sum)
    # skip's last lane == done_in OR any termination in this chunk.
    done_out = skip[:, -1:]
    return t_out, done_out, contrib


def chunk_forward_fast(
    inst: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    lane_mask: jnp.ndarray,
    pbasis: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Carry-independent fast-forward chunk math (inference only).

    The exact path's per-pixel termination exists to reproduce the CUDA
    `done` flag bit-for-bit; for DISPLAY output it is numerically
    irrelevant — once T < 1e-4, the total remaining premultiplied color
    telescopes to <= T itself (sum_k a_k prod_{j<k}(1-a_j) <= 1), i.e.
    < 1e-4 < half an 8-bit step. Dropping it makes this entire function
    independent of the transmittance carry:

        contrib = t_in * contrib_nom      (per-pixel row scale)
        t_out   = t_in * decay

    so the heavy body (alpha chain + cumsum matmul + color contraction)
    software-pipelines across chunks with only two narrow multiplies on
    the serial path. Error vs the exact forward stays within the fast
    path's existing bf16 budget (pinned < 4e-3 vs the oracle).

    Returns (decay (PIX, 1), contrib_nom (PIX, 3)) — multiply both by the
    caller's carried transmittance.
    """
    alpha, _, _ = chunk_alpha(inst, px, py, lane_mask, pbasis=pbasis)
    lg = jnp.log1p(-alpha)
    cum_excl = _tri_cumsum(lg, exclusive=True, exact_input=True)
    w_nom = alpha * jnp.exp(cum_excl)  # weights for t_in == 1
    c3 = inst[ROW_R : ROW_B + 1, :]
    contrib_nom, lg_sum = _weighted_color_sums(w_nom, c3, lg, fast=True)
    return jnp.exp(lg_sum), contrib_nom


def moment_basis(px: jnp.ndarray, py: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Tile-centered pixel moment basis for the backward's MXU reductions.

    Returns (m [12, PIX] bf16 — the 6 basis rows hi/lo split, stacked — cx,
    cy). Centered coordinates px' = px - cx take values k+0.5 with
    |k| < tile_w/2; the degree-2 products need up to ~2*log2(tile_w) + 2
    mantissa bits (11 bits for 32px tiles), so a single bf16 row would
    round them and the rounding is AMPLIFIED by the moment-translation
    cancellation in chunk_backward — the hi/lo split keeps the basis exact
    for every supported tile width at no real cost (the moment matmul is
    basis-row-rate). Tile-invariant: compute ONCE per tile, outside the
    chunk loop.
    """
    cx = 0.5 * (jnp.max(px) + jnp.min(px))
    cy = 0.5 * (jnp.max(py) + jnp.min(py))
    pxc = (px - cx)[:, 0]  # (PIX,)
    pyc = (py - cy)[:, 0]
    ones = jnp.ones_like(pxc)
    m = jnp.stack(
        [ones, pxc, pyc, pxc * pxc, pxc * pyc, pyc * pyc], axis=0
    )  # (6, PIX) f32
    m_hi, m_lo = _hi_lo(m)
    return jnp.concatenate([m_hi, m_lo], axis=0), cx, cy


def chunk_backward(
    inst: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    t_in: jnp.ndarray,
    done_in: jnp.ndarray,
    suffix_in: jnp.ndarray,
    d_color: jnp.ndarray,
    lane_mask: jnp.ndarray,
    basis: tuple[jnp.ndarray, ...],
    pbasis: tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray] | None = None,
) -> tuple[tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Per-instance gradients for one chunk, via forward-order replay.

    Closed-form over the suffix: for instance k with weight w_k = a_k T_k,
      dL/dc_k   = w_k * dC
      dL/da_k   = sum_ch dC_ch [ c_k,ch T_k - (C_total - P_k)_ch / (1-a_k) ]
                  - dT_final * T_final / (1 - a_k)
    where P_k is the running premultiplied prefix color through k. This is
    the same algebra as the CUDA backward's accum_rec recurrence, evaluated
    forward-order so no state needs saving. The whole bracket is carried as
    ONE scalar per pixel instead of the 3-channel prefix color: with
      A' = sum_ch dC_ch (C_total - prefix_in)_ch + dT_final * T_final
    and s_k = sum_ch dC_ch c_k,ch,
      dL/da_k = s_k T_k - (A' - cum_incl(w s)_k) / (1 - a_k),
    and across chunks A' just decreases by the chunk's total(w s) — cumsum
    linearity folds the three per-channel suffixes into the one triangular
    matmul that is needed anyway.

    Args:
      inst: (ROWS, K); px/py: (PIX, 1); t_in/done_in: (PIX, 1) replayed state.
      suffix_in: (PIX, 1) the A' carry; initialize per tile to
        sum_ch dC_ch C_total_ch + d_tfinal * t_final.
      d_color: (PIX, 3) cotangent of the tile color.
      lane_mask: (1, K) f32 0/1 range mask (foreign lanes -> zero grads).
      basis: moment_basis(px, py), hoisted out of the chunk loop.

    Returns:
      (t_out, done_out, suffix_out) replay state, and grads (ROWS, K) with
      rows [dmx, dmy, dca, dcb, dcc, dr, dg, db, dop].
    """
    alpha, G, keep = chunk_alpha(inst, px, py, lane_mask, pbasis=pbasis)
    lg = jnp.log1p(-alpha)
    cum_excl = _tri_cumsum(lg, exclusive=True)
    e_excl = jnp.exp(cum_excl)
    t_before = t_in * e_excl
    w_pre = alpha * t_before
    # Monotone termination replay — identical formulation to chunk_forward
    # (the suffix algebra requires the replayed skip decisions to match the
    # forward's bit-for-bit).
    f_incl = e_excl * (1.0 - alpha)
    skip = jnp.minimum(
        done_in + jnp.where(t_in * f_incl < T_EPS, 1.0, 0.0), 1.0
    )
    live = 1.0 - skip
    w = w_pre * live  # (PIX, K)

    # dL/dc_k[ch] = sum_px w * dC_ch -> (3, K): one hi/lo MXU contraction over
    # pixels (dC split exactly; w rounded to bf16).
    dct = d_color.T  # (3, PIX)
    dct_hi, dct_lo = _hi_lo(dct)
    d_colors = jnp.dot(
        jnp.concatenate([dct_hi, dct_lo], axis=0),
        w.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    d_colors = d_colors[:3] + d_colors[3:]  # (3, K)

    # s[p,k] = sum_ch dC[p,ch] c3[ch,k]: a (PIX,3) x (3,K) MXU contraction
    # (hi/lo products via LHS column blocks; dc_lo*c_lo dropped) instead of
    # three full (PIX,K) VPU multiplies.
    c3 = inst[ROW_R : ROW_B + 1, :]  # (3, K)
    dc_hi, dc_lo = _hi_lo(d_color)
    c_hi, c_lo = _hi_lo(c3)
    s = jnp.dot(
        jnp.concatenate([dc_hi, dc_hi, dc_lo], axis=-1),
        jnp.concatenate([c_hi, c_lo, c_hi], axis=0),
        preferred_element_type=jnp.float32,
    )  # (PIX, K)
    u = w * s
    cum_u = _tri_cumsum(u, exclusive=False)
    one_minus = 1.0 - alpha
    d_alpha = (s * t_before - (suffix_in - cum_u) / one_minus) * live
    suffix_out = suffix_in - cum_u[:, -1:]
    # Replay transmittance: sum of lg over live lanes, one hi/lo MXU column.
    lgl = lg * live
    l_hi, l_lo = _hi_lo(lgl)
    k2 = lgl.shape[-1]
    lg_sum = jnp.dot(
        jnp.concatenate([l_hi, l_lo], axis=-1),
        jnp.ones((2 * k2, 1), jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )

    # Chain through alpha = op * exp(power) (straight-through past the cap).
    # All six position/conic gradients are pixel sums of d_power times a
    # degree-2 polynomial in (dx, dy); with q = G * d_alpha * keep
    # (d_power = op * q) they reduce to the 0th..2nd moments of q over the
    # tile-centered pixel basis — ONE small matmul on the MXU instead of
    # six sublane-reduction trees (the kernel's dominant cost).
    op = inst[ROW_OP : ROW_OP + 1, :]
    q = G * d_alpha * keep  # (PIX, K)
    m, cx, cy = basis
    mq2 = jnp.dot(m, q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    mq = mq2[:6] + mq2[6:]
    s0 = mq[0:1, :]
    sx = mq[1:2, :]
    sy = mq[2:3, :]
    sxx = mq[3:4, :]
    sxy = mq[4:5, :]
    syy = mq[5:6, :]
    d_op = s0  # sum of q

    mx = inst[ROW_MX : ROW_MX + 1, :]
    my = inst[ROW_MY : ROW_MY + 1, :]
    ca = inst[ROW_CA : ROW_CA + 1, :]
    cb = inst[ROW_CB : ROW_CB + 1, :]
    cc = inst[ROW_CC : ROW_CC + 1, :]
    # dx = mx - px = mxc - px' with mxc = mx - cx; moments translate.
    mxc = mx - cx
    myc = my - cy
    dxm = mxc * s0 - sx  # sum q * dx
    dym = myc * s0 - sy
    dxxm = mxc * mxc * s0 - 2.0 * mxc * sx + sxx  # sum q * dx^2
    dxym = mxc * myc * s0 - mxc * sy - myc * sx + sxy
    dyym = myc * myc * s0 - 2.0 * myc * sy + syy
    d_mx = -op * (ca * dxm + cb * dym)
    d_my = -op * (cc * dym + cb * dxm)
    d_ca = -0.5 * op * dxxm
    d_cb = -op * dxym
    d_cc = -0.5 * op * dyym

    k = inst.shape[-1]
    grads = jnp.concatenate(
        [
            d_mx,
            d_my,
            d_ca,
            d_cb,
            d_cc,
            d_colors,
            d_op,
            jnp.zeros((ROWS - N_FIELDS, k), jnp.float32),
        ],
        axis=0,
    )  # (ROWS, K)

    # Replay state for the next chunk.
    t_out = t_in * jnp.exp(lg_sum)
    done_out = skip[:, -1:]
    return (t_out, done_out, suffix_out), grads


def tile_pixel_coords(
    tile_id: jnp.ndarray, tiles_x: int, tile_w: int, tile_h: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Continuous pixel coordinates for a tile's pixels, shape (PIX, 1).

    Pixel order within a tile is row-major: idx = row * tile_w + col.
    """
    pix = tile_w * tile_h
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    idx = lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = (tx * tile_w + idx % tile_w).astype(jnp.float32)
    py = (ty * tile_h + idx // tile_w).astype(jnp.float32)
    return px, py


def build_inst_data(
    fields: jnp.ndarray,
    sorted_owner: jnp.ndarray,
) -> jnp.ndarray:
    """Gather DEPTH-ORDERED packed per-Gaussian fields [N, N_FIELDS] into
    the tile-sorted instance stream. Returns (ROWS, P) f32; dead slots
    (owner == N) become a zero row whose opacity 0 makes them no-ops.
    """
    fields = jnp.pad(fields, ((0, 1), (0, ROWS - N_FIELDS)))  # sentinel row
    # Row gather (contiguous 64B rows — far faster than a lane-axis gather
    # at instance rate), then one bulk transpose to the kernel layout.
    inst_rows = jnp.take(fields, sorted_owner, axis=0)  # (P, ROWS)
    return inst_rows.T


def untile_image(
    tile_color: jnp.ndarray,
    tile_t: jnp.ndarray,
    height: int,
    width: int,
    tiles_x: int,
    tiles_y: int,
    tile_w: int,
    tile_h: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[T, PIX, 3] tiles -> ([3, H, W] color, [H, W] transmittance), cropped
    to the true image size."""
    if tile_h is None:
        tile_h = tile_w
    c = tile_color.reshape(tiles_y, tiles_x, tile_h, tile_w, 3)
    c = c.transpose(4, 0, 2, 1, 3).reshape(
        3, tiles_y * tile_h, tiles_x * tile_w
    )[:, :height, :width]
    t = tile_t.reshape(tiles_y, tiles_x, tile_h, tile_w)
    t = t.transpose(0, 2, 1, 3).reshape(tiles_y * tile_h, tiles_x * tile_w)[
        :height, :width
    ]
    return c, t
