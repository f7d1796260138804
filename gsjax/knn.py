"""Mean squared distance to the 3 nearest neighbors, for scale init.

TPU-native replacement for the simple-knn CUDA submodule's single entry
`distCUDA2(points) -> [N]` (reference: scene/gaussian_model.py:20,134).
Called once at scene init, off the hot path, so a blocked exact top-k over
pairwise distances is plenty: O(N^2) FLOPs streamed in (rows x cols) blocks
with a running top-3, never materializing the full distance matrix.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


@functools.partial(jax.jit, static_argnames=("row_block", "col_block"))
def mean_knn_dist2(
    points: jnp.ndarray, row_block: int = 1024, col_block: int = 4096
) -> jnp.ndarray:
    """[N,3] points -> [N] mean squared distance to the 3 nearest neighbors
    (excluding self)."""
    n = points.shape[0]
    pad_rows = -(-n // row_block) * row_block
    pad_cols = -(-n // col_block) * col_block
    pts_r = jnp.pad(points, ((0, pad_rows - n), (0, 0)), constant_values=jnp.inf)
    pts_c = jnp.pad(points, ((0, pad_cols - n), (0, 0)), constant_values=jnp.inf)
    col_ids = jnp.arange(pad_cols)

    def row_step(r0):
        rows = lax.dynamic_slice(pts_r, (r0, 0), (row_block, 3))
        row_ids = r0 + jnp.arange(row_block)

        def col_step(carry, c0):
            best = carry  # [row_block, 3] smallest squared distances
            cols = lax.dynamic_slice(pts_c, (c0, 0), (col_block, 3))
            d2 = (
                jnp.sum(rows * rows, axis=1, keepdims=True)
                - 2.0 * jnp.matmul(rows, cols.T, precision=lax.Precision.HIGHEST)
                + jnp.sum(cols * cols, axis=1)[None, :]
            )
            ids = c0 + col_ids[:col_block]
            self_or_pad = (ids[None, :] == row_ids[:, None]) | (ids[None, :] >= n)
            d2 = jnp.where(self_or_pad, jnp.inf, d2)
            merged = jnp.concatenate([best, d2], axis=1)
            best = -lax.top_k(-merged, 3)[0]
            return best, None

        init = jnp.full((row_block, 3), jnp.inf)
        best, _ = lax.scan(
            col_step, init, jnp.arange(0, pad_cols, col_block)
        )
        # Guard degenerate inputs (n <= 3): unmatched slots contribute 0.
        best = jnp.where(jnp.isfinite(best), best, 0.0)
        return jnp.mean(best, axis=1)

    out = lax.map(row_step, jnp.arange(0, pad_rows, row_block))
    return out.reshape(-1)[:n]
