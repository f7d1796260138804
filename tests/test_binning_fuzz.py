"""Fuzz tests for the closed-form binning geometry.

The two-level expansion rests on exact math — the per-row x-interval of the
alpha >= 1/255 sublevel ellipse clipped to a pixel strip, and the box
Mahalanobis minimum — evaluated over extreme eccentricities and strip
placements. Both are validated against dense numeric grid references, and
the full renderer is fuzzed against the oracle over several random scenes
with adversarially anisotropic splats.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.render.binning import _qmin_over_rect, _row_x_interval


def _random_conics(rng, n):
    """Inverse covariances with eigenvalue ratios up to 1e4 and random
    orientation (ca, cb, cc)."""
    lam1 = 10.0 ** rng.uniform(-3, 1, n)
    lam2 = lam1 * 10.0 ** rng.uniform(0, 4, n)
    th = rng.uniform(0, np.pi, n)
    c, s = np.cos(th), np.sin(th)
    ca = lam1 * c * c + lam2 * s * s
    cc = lam1 * s * s + lam2 * c * c
    cb = (lam1 - lam2) * c * s
    return ca.astype(np.float32), cb.astype(np.float32), cc.astype(np.float32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_row_x_interval_matches_grid(seed):
    rng = np.random.default_rng(seed)
    n = 256
    ca, cb, cc = _random_conics(rng, n)
    qmax = rng.uniform(0.5, 12.0, n).astype(np.float32)
    y0 = rng.uniform(-30, 30, n).astype(np.float32)
    y1 = y0 + rng.uniform(0.0, 15.0, n).astype(np.float32)

    x_lo, x_hi, nonempty = (
        np.asarray(v)
        for v in _row_x_interval(
            jnp.asarray(y0), jnp.asarray(y1),
            jnp.asarray(ca), jnp.asarray(cb), jnp.asarray(cc),
            jnp.asarray(qmax),
        )
    )

    # Dense numeric reference: sample dy in the strip, solve the 1D slice.
    ys = np.linspace(y0, y1, 512).T  # (n, 512)
    disc = qmax[:, None] * ca[:, None] - (
        ca[:, None] * cc[:, None] - cb[:, None] ** 2
    ) * ys**2
    ok = disc >= 0
    root = np.sqrt(np.maximum(disc, 0.0))
    lo_all = np.where(ok, (-cb[:, None] * ys - root) / ca[:, None], np.inf)
    hi_all = np.where(ok, (-cb[:, None] * ys + root) / ca[:, None], -np.inf)
    ref_nonempty = ok.any(axis=1)
    ref_lo = lo_all.min(axis=1)
    ref_hi = hi_all.max(axis=1)

    np.testing.assert_array_equal(nonempty, ref_nonempty)
    m = ref_nonempty
    scale = np.maximum(np.abs(ref_hi[m]), 1.0)
    # The closed form is exact; the grid is the approximation (512 samples
    # can miss sharp sqrt peaks at high eccentricity), so closed-form bounds
    # must CONTAIN the sampled extent...
    assert np.all(x_hi[m] >= ref_hi[m] - 1e-3 * scale)
    assert np.all(x_lo[m] <= ref_lo[m] + 1e-3 * scale)
    # ...and be TIGHT: the bound touches the ellipse — the strip-minimum of
    # q at x = x_hi (attained at the clamped 1D optimum) equals qmax.
    for x, sgn in ((x_hi, 1.0), (x_lo, -1.0)):
        y_opt = np.clip(-cb * x / cc, y0, y1)
        q = ca * x * x + 2.0 * cb * x * y_opt + cc * y_opt * y_opt
        np.testing.assert_allclose(q[m], qmax[m], rtol=2e-3)


@pytest.mark.parametrize("seed", [0, 1])
def test_qmin_over_rect_matches_grid(seed):
    rng = np.random.default_rng(seed + 10)
    n = 256
    ca, cb, cc = _random_conics(rng, n)
    dx0 = rng.uniform(-40, 20, n).astype(np.float32)
    dx1 = dx0 + rng.uniform(0.0, 20.0, n).astype(np.float32)
    dy0 = rng.uniform(-40, 20, n).astype(np.float32)
    dy1 = dy0 + rng.uniform(0.0, 20.0, n).astype(np.float32)

    qmin = np.asarray(
        _qmin_over_rect(
            jnp.asarray(dx0), jnp.asarray(dx1), jnp.asarray(dy0),
            jnp.asarray(dy1), jnp.asarray(ca), jnp.asarray(cb), jnp.asarray(cc),
        )
    )
    xs = np.linspace(dx0, dx1, 64).T[:, :, None]  # (n, 64, 1)
    ys = np.linspace(dy0, dy1, 64).T[:, None, :]  # (n, 1, 64)
    q = (
        ca[:, None, None] * xs**2
        + 2.0 * cb[:, None, None] * xs * ys
        + cc[:, None, None] * ys**2
    )
    ref = q.reshape(n, -1).min(axis=1)
    # The closed form is the true min, so it can only be BELOW the sampled
    # min (the grid misses sharp valleys at high eccentricity)...
    assert np.all(qmin <= ref + 1e-3 * np.maximum(ref, 1.0))

    # ...and it is exact: cross-check against the (independently validated)
    # strip-interval solver — the {q <= qmin*(1+eps)} level set must reach
    # the box's x-range, and {q <= qmin*(1-eps)} must not.
    def intersects(qlevel):
        lo, hi, ne = (
            np.asarray(v)
            for v in _row_x_interval(
                jnp.asarray(dy0), jnp.asarray(dy1),
                jnp.asarray(ca), jnp.asarray(cb), jnp.asarray(cc),
                jnp.asarray(qlevel.astype(np.float32)),
            )
        )
        return ne & (hi >= dx0) & (lo <= dx1)

    pos = qmin > 1e-5
    assert np.all(intersects(qmin * 1.002 + 1e-6))
    assert not np.any(intersects(np.where(pos, qmin * 0.998, -1.0))[pos])


@pytest.mark.parametrize(
    "seed,tw,th",
    [(11, 16, 16), (12, 16, 16), (13, 16, 16), (11, 32, 32), (12, 64, 32)],
)
def test_anisotropic_scene_matches_oracle(seed, tw, th):
    """Whole-renderer fuzz: elongated thin splats at random orientations —
    the regime where the tight rect + row intervals do real work — must
    still match the oracle bit-for-bit-ish."""
    import jax

    from gsjax.config import RasterConfig
    from gsjax.render.api import render, render_oracle
    from tests.scene_utils import orbit_camera, random_scene

    params, aux = random_scene(120, seed=seed)
    # Stretch: one axis up to ~30x the others.
    key = jax.random.PRNGKey(seed)
    stretch = jax.random.uniform(key, params.scaling.shape, minval=0.0, maxval=3.4)
    params = params.replace(scaling=params.scaling + stretch)
    cam = orbit_camera(0.9 * seed, width=64, height=48)
    cfg = RasterConfig(
        tile_w=tw, tile_h=th, max_instances=1 << 14, max_rows=1 << 14,
        interpret=True,
    )
    bg = jnp.asarray([0.3, 0.2, 0.1])

    img = render(
        params, cam, active_sh_degree=3, bg_color=bg, cfg=cfg, alive=aux.alive
    ).image
    ref = render_oracle(
        params, cam, active_sh_degree=3, bg_color=bg, alive=aux.alive
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-3, rtol=1e-3)
