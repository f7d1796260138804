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


def _lane_sums(channels: list[jnp.ndarray]) -> jnp.ndarray:
    """Per-channel lane sums on the MXU: channels = [c x (PIX, K)] ->
    (PIX, c) with column j = sum_k channels[j][p, k].

    The channels are packed side by side on the lane axis and multiplied by
    a block-diagonal 0/1 selector (exact in bf16); inputs are hi/lo split,
    so the whole reduction is TWO (PIX, cK) x (cK, c) matmul launches —
    Mosaic rejects lane-contracting dot_generals and a VPU cross-lane
    reduction tree costs ~7 passes per channel.
    """
    c = len(channels)
    k = channels[0].shape[-1]
    x = jnp.concatenate(channels, axis=-1)  # (PIX, c*K)
    rows = lax.broadcasted_iota(jnp.int32, (c * k, c), 0)
    cols = lax.broadcasted_iota(jnp.int32, (c * k, c), 1)
    sel = jnp.where(rows // k == cols, 1.0, 0.0).astype(jnp.bfloat16)
    hi, lo = _hi_lo(x)
    return jnp.dot(hi, sel, preferred_element_type=jnp.float32) + jnp.dot(
        lo, sel, preferred_element_type=jnp.float32
    )


def chunk_alpha(
    inst: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    lane_mask: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per (pixel, instance) alpha for one chunk.

    Args:
      inst: (ROWS, K) instance fields.
      px, py: (PIX, 1) pixel coordinates.
      lane_mask: (1, K) f32 0/1 — 0 for lanes outside this tile's range.

    Returns:
      alpha: (PIX, K) capped, skip-masked alpha (straight-through cap grad).
      G: (PIX, K) the Gaussian falloff exp(power) (for opacity gradients).
      keep: (PIX, K) f32 0/1 skip mask (stop-gradient; includes lane_mask).
    """
    mx = inst[ROW_MX : ROW_MX + 1, :]  # (1, K)
    my = inst[ROW_MY : ROW_MY + 1, :]
    ca = inst[ROW_CA : ROW_CA + 1, :]
    cb = inst[ROW_CB : ROW_CB + 1, :]
    cc = inst[ROW_CC : ROW_CC + 1, :]
    op = inst[ROW_OP : ROW_OP + 1, :]
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
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Composite one chunk of depth-ordered instances into a tile.

    Args:
      inst: (ROWS, K) instance fields.
      px, py: (PIX, 1) pixel coordinates.
      t_in: (PIX, 1) transmittance entering the chunk.
      done_in: (PIX, 1) f32 0/1 — pixel already terminated.
      lane_mask: (1, K) f32 0/1 range mask.

    Returns:
      t_out: (PIX, 1), done_out: (PIX, 1), contrib: (PIX, 3) premultiplied
      color added by this chunk (background NOT composited here).
    """
    alpha, _, _ = chunk_alpha(inst, px, py, lane_mask)
    lg = jnp.log1p(-alpha)  # <= 0; alpha <= 0.99 keeps this finite
    cum_excl = _tri_cumsum(lg, exclusive=True)
    t_before = t_in * jnp.exp(cum_excl)  # (PIX, K) unmasked T before k
    # Termination test: the contribution that would push T below eps is
    # itself skipped, and the pixel stays done forever.
    test = jnp.where((t_before * (1.0 - alpha) < T_EPS) & (alpha > 0.0), 1.0, 0.0)
    skip = jnp.minimum(
        done_in + _tri_cumsum(test, exclusive=False, exact_input=True), 1.0
    )
    live = 1.0 - skip  # (PIX, K)
    w = alpha * t_before * live  # contribution weights
    c3 = inst[ROW_R : ROW_B + 1, :]  # (3, K)
    sums = _lane_sums(
        [w * c3[0:1, :], w * c3[1:2, :], w * c3[2:3, :], lg * live]
    )  # (PIX, 4): premultiplied rgb + log-transmittance
    contrib = sums[:, :3]
    t_out = t_in * jnp.exp(sums[:, 3:4])
    # skip's last lane == done_in OR any termination in this chunk.
    done_out = skip[:, -1:]
    return t_out, done_out, contrib


def moment_basis(px: jnp.ndarray, py: jnp.ndarray) -> tuple[jnp.ndarray, ...]:
    """Tile-centered pixel moment basis for the backward's MXU reductions.

    Returns (m [6, PIX] bf16, cx, cy). Centered coordinates px' = px - cx
    take values k+0.5 with |k| < tile_size/2, so px', py', and their
    products up to degree 2 are EXACT in bf16 — the moment matmul loses no
    precision on the basis side. Tile-invariant: compute ONCE per tile,
    outside the chunk loop.
    """
    cx = 0.5 * (jnp.max(px) + jnp.min(px))
    cy = 0.5 * (jnp.max(py) + jnp.min(py))
    pxc = (px - cx)[:, 0]  # (PIX,)
    pyc = (py - cy)[:, 0]
    ones = jnp.ones_like(pxc)
    m = jnp.stack(
        [ones, pxc, pyc, pxc * pxc, pxc * pyc, pyc * pyc], axis=0
    )  # (6, PIX)
    return m.astype(jnp.bfloat16), cx, cy


def chunk_backward(
    inst: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    t_in: jnp.ndarray,
    done_in: jnp.ndarray,
    prefix_in: jnp.ndarray,
    c_total: jnp.ndarray,
    t_final: jnp.ndarray,
    d_color: jnp.ndarray,
    d_tfinal: jnp.ndarray,
    lane_mask: jnp.ndarray,
    basis: tuple[jnp.ndarray, ...],
) -> tuple[tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    """Per-instance gradients for one chunk, via forward-order replay.

    Closed-form over the suffix: for instance k with weight w_k = a_k T_k,
      dL/dc_k   = w_k * dC
      dL/da_k   = sum_ch dC_ch [ c_k,ch T_k - (C_total - P_k)_ch / (1-a_k) ]
                  - dT_final * T_final / (1 - a_k)
    where P_k is the running premultiplied prefix color through k. This is
    the same algebra as the CUDA backward's accum_rec recurrence, evaluated
    forward-order so no state needs saving.

    Args:
      inst: (ROWS, K); px/py: (PIX, 1); t_in/done_in: (PIX, 1) replayed state.
      prefix_in: (PIX, 3) premultiplied color accumulated before this chunk.
      c_total: (PIX, 3) full-tile forward output color.
      t_final: (PIX, 1) full-tile final transmittance.
      d_color: (PIX, 3) cotangent of the tile color.
      d_tfinal: (PIX, 1) cotangent of the tile transmittance.
      lane_mask: (1, K) f32 0/1 range mask (foreign lanes -> zero grads).
      basis: moment_basis(px, py), hoisted out of the chunk loop.

    Returns:
      (t_out, done_out, prefix_out) replay state, and grads (ROWS, K) with
      rows [dmx, dmy, dca, dcb, dcc, dr, dg, db, dop].
    """
    alpha, G, keep = chunk_alpha(inst, px, py, lane_mask)
    lg = jnp.log1p(-alpha)
    cum_excl = _tri_cumsum(lg, exclusive=True)
    t_before = t_in * jnp.exp(cum_excl)
    test = jnp.where((t_before * (1.0 - alpha) < T_EPS) & (alpha > 0.0), 1.0, 0.0)
    skip = jnp.minimum(
        done_in + _tri_cumsum(test, exclusive=False, exact_input=True), 1.0
    )
    live = 1.0 - skip
    w = alpha * t_before * live  # (PIX, K)

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

    # suffix_k = C_total - prefix_in - cum_wc_k per channel. Since cumsum is
    # LINEAR, the channel sum over dC of cum(wc) equals cum(w * s) with
    # s = sum_ch dC_ch c_ch — ONE triangular matmul instead of three:
    #   d_alpha = s*T_k - (A - cum_incl(w*s)) / (1-alpha),
    #   A = sum_ch dC_ch (C_total - prefix_in)_ch.
    c3 = inst[ROW_R : ROW_B + 1, :]  # (3, K)
    s = (
        d_color[:, 0:1] * c3[0:1, :]
        + d_color[:, 1:2] * c3[1:2, :]
        + d_color[:, 2:3] * c3[2:3, :]
    )  # (PIX, K)
    u = w * s
    cum_u = _tri_cumsum(u, exclusive=False)
    A = jnp.sum(d_color * (c_total - prefix_in), axis=-1, keepdims=True)  # (PIX,1)
    one_minus = 1.0 - alpha
    # d_tfinal * t_final is tile-constant: fold it into the suffix numerator
    # so the chunk pays ONE division. Callers may pre-multiply and pass it
    # via d_tfinal with t_final=1, but keeping both is free:
    dtt = d_tfinal * t_final  # (PIX, 1)
    d_alpha = (s * t_before - (A + dtt - cum_u) / one_minus) * live
    sums = _lane_sums(
        [w * c3[0:1, :], w * c3[1:2, :], w * c3[2:3, :], lg * live]
    )  # (PIX, 4)
    prefix_out = prefix_in + sums[:, :3]

    # Chain through alpha = op * exp(power) (straight-through past the cap).
    # All six position/conic gradients are pixel sums of d_power times a
    # degree-2 polynomial in (dx, dy); with q = G * d_alpha * keep
    # (d_power = op * q) they reduce to the 0th..2nd moments of q over the
    # tile-centered pixel basis — ONE small matmul on the MXU instead of
    # six sublane-reduction trees (the kernel's dominant cost).
    op = inst[ROW_OP : ROW_OP + 1, :]
    q = G * d_alpha * keep  # (PIX, K)
    m, cx, cy = basis
    mq = jnp.dot(m, q.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
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
    t_out = t_in * jnp.exp(sums[:, 3:4])
    done_out = skip[:, -1:]
    return (t_out, done_out, prefix_out), grads


def tile_pixel_coords(
    tile_id: jnp.ndarray, tiles_x: int, tile_size: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Continuous pixel coordinates for a tile's pixels, shape (PIX, 1).

    Pixel order within a tile is row-major: idx = row * tile_size + col.
    """
    pix = tile_size * tile_size
    tx = tile_id % tiles_x
    ty = tile_id // tiles_x
    idx = lax.broadcasted_iota(jnp.int32, (pix, 1), 0)
    px = (tx * tile_size + idx % tile_size).astype(jnp.float32)
    py = (ty * tile_size + idx // tile_size).astype(jnp.float32)
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
    tile_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[T, PIX, 3] tiles -> ([3, H, W] color, [H, W] transmittance), cropped
    to the true image size."""
    c = tile_color.reshape(tiles_y, tiles_x, tile_size, tile_size, 3)
    c = c.transpose(4, 0, 2, 1, 3).reshape(
        3, tiles_y * tile_size, tiles_x * tile_size
    )[:, :height, :width]
    t = tile_t.reshape(tiles_y, tiles_x, tile_size, tile_size)
    t = t.transpose(0, 2, 1, 3).reshape(tiles_y * tile_size, tiles_x * tile_size)[
        :height, :width
    ]
    return c, t
