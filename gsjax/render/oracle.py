"""Naive O(N * pixels) differentiable reference rasterizer.

The ground-truth oracle for the tiled/Pallas rasterizers (SURVEY.md section 4
test strategy): depth-sorted front-to-back alpha compositing over ALL
Gaussians for EVERY pixel, as one big lax.scan. Slow by construction; used in
tests and tiny-scene debugging only.

Compositing semantics mirror the CUDA renderCUDA loop exactly:
  alpha   = min(0.99, opacity * exp(-0.5 d^T conic d))    [cap]
  skip    alpha < 1/255
  done    when T * (1 - alpha) < 1e-4  (that contribution is NOT applied)
  color   = sum_i rgb_i * alpha_i * T_i  +  T_final * bg
The 0.99 cap uses a straight-through gradient (the CUDA backward multiplies
dL/dalpha by G and opacity unconditionally), so autodiff through this oracle
reproduces the CUDA gradient convention.

Optionally applies the same 16x16-tile rectangle culling as the tiled path
(a Gaussian only contributes to pixels whose tile intersects its 3-sigma
bounding square), making oracle and tiled outputs comparable bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from gsjax.core.cameras import Camera
from gsjax.render.preprocess import Projected

ALPHA_CAP = 0.99
ALPHA_SKIP = 1.0 / 255.0
T_EPS = 1e-4


def _capped_alpha(raw: jnp.ndarray) -> jnp.ndarray:
    """min(0.99, raw) with straight-through gradient (CUDA convention)."""
    capped = jnp.minimum(ALPHA_CAP, raw)
    return raw + lax.stop_gradient(capped - raw)


def tile_rect(
    mean_pix: jnp.ndarray,
    radius: jnp.ndarray,
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Inclusive-exclusive tile rectangle touched by each splat, clamped to
    the grid (the CUDA getRect helper). Returns (x0, y0, x1, y1) int32."""
    mp = lax.stop_gradient(mean_pix)
    r = radius.astype(jnp.float32)
    x0 = jnp.clip(((mp[:, 0] - r) / tile_size), 0, tiles_x).astype(jnp.int32)
    y0 = jnp.clip(((mp[:, 1] - r) / tile_size), 0, tiles_y).astype(jnp.int32)
    x1 = jnp.clip(
        jnp.ceil((mp[:, 0] + r + 1.0) / tile_size), 0, tiles_x
    ).astype(jnp.int32)
    y1 = jnp.clip(
        jnp.ceil((mp[:, 1] + r + 1.0) / tile_size), 0, tiles_y
    ).astype(jnp.int32)
    # Zero-radius (culled) splats touch nothing.
    empty = radius <= 0
    x1 = jnp.where(empty, x0, x1)
    y1 = jnp.where(empty, y0, y1)
    return x0, y0, x1, y1


def composite_oracle(
    proj: Projected,
    camera: Camera,
    bg: jnp.ndarray,
    tile_size: int | None = 16,
) -> jnp.ndarray:
    """Composite all projected Gaussians into an image.

    Args:
      proj: preprocess() output (capacity-sized; radius==0 rows are skipped).
      camera: provides image dims.
      bg: [3] background color composited under residual transmittance.
      tile_size: if set, apply tile-rect culling at this granularity to match
        the tiled rasterizer; None disables culling (pure EWA).

    Returns:
      [3, H, W] image.
    """
    H, W = camera.height, camera.width
    px = jnp.arange(W, dtype=jnp.float32)[None, :]  # [1,W]
    py = jnp.arange(H, dtype=jnp.float32)[:, None]  # [H,1]

    order = jnp.argsort(lax.stop_gradient(proj.depth))
    # Push invisible splats to the end and mark them.
    vis = proj.radius[order] > 0

    if tile_size is not None:
        tiles_x = (W + tile_size - 1) // tile_size
        tiles_y = (H + tile_size - 1) // tile_size
        rx0, ry0, rx1, ry1 = tile_rect(
            proj.mean_pix, proj.radius, tiles_x, tiles_y, tile_size
        )
        tile_col = (jnp.arange(W) // tile_size)[None, :]  # [1,W]
        tile_row = (jnp.arange(H) // tile_size)[:, None]  # [H,1]
    else:
        rx0 = ry0 = rx1 = ry1 = jnp.zeros_like(proj.radius)
        tile_col = tile_row = None

    xs = (
        proj.mean_pix[order],
        proj.conic[order],
        proj.rgb[order],
        proj.opacity[order],
        vis,
        rx0[order],
        ry0[order],
        rx1[order],
        ry1[order],
    )

    def step(carry, x):
        T, C, done = carry
        mean, conic, rgb, op, visible, x0, y0, x1, y1 = x
        dx = mean[0] - px  # [1,W] -> broadcast [H,W]
        dy = mean[1] - py  # [H,1]
        power = -0.5 * (conic[0] * dx * dx + conic[2] * dy * dy) - conic[1] * dx * dy
        g = jnp.exp(jnp.minimum(power, 0.0))
        alpha = _capped_alpha(op * g)
        keep = (alpha >= ALPHA_SKIP) & visible & (power <= 0.0)
        if tile_size is not None:
            in_rect = (
                (tile_col >= x0) & (tile_col < x1) & (tile_row >= y0) & (tile_row < y1)
            )
            keep = keep & in_rect
        alpha = jnp.where(keep, alpha, 0.0)
        # A pixel is done once a contribution WOULD push T below eps; that
        # contribution is skipped and the pixel never resumes (the CUDA loop
        # sets a persistent `done` flag and `continue`s).
        done = done | ((T * (1.0 - alpha) < T_EPS) & keep)
        alpha = jnp.where(done, 0.0, alpha)
        w = alpha * T
        C = C + rgb[:, None, None] * w[None, :, :]
        T = T * (1.0 - alpha)
        return (T, C, done), None

    T0 = jnp.ones((H, W), dtype=jnp.float32)
    C0 = jnp.zeros((3, H, W), dtype=jnp.float32)
    done0 = jnp.zeros((H, W), dtype=bool)
    (T, C, _), _ = lax.scan(step, (T0, C0, done0), xs)
    return C + T[None, :, :] * bg[:, None, None]
