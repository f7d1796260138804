"""Skysphere shell init tests."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from gsjax.sky import add_sky_shell, fibonacci_sphere, sky_shell_arrays
from gsjax.synthetic import look_at_origin_camera, random_scene


def test_fibonacci_sphere_unit():
    d = fibonacci_sphere(500)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-5)
    # Near-uniform: mean direction ~ 0.
    assert np.linalg.norm(d.mean(axis=0)) < 0.05


def test_sky_shell_arrays_geometry():
    center = np.array([1.0, -2.0, 3.0], np.float32)
    sky = sky_shell_arrays(256, center, radius=50.0, sh_degree=3)
    r = np.linalg.norm(sky["xyz"] - center, axis=1)
    np.testing.assert_allclose(r, 50.0, rtol=1e-5)
    assert sky["features_rest"].shape == (256, 15, 3)
    # Splat size covers the sphere: s = 2*50*sqrt(pi/256).
    np.testing.assert_allclose(
        np.exp(sky["scaling"]), 2.0 * 50.0 * np.sqrt(np.pi / 256), rtol=1e-5
    )


def test_add_sky_shell_appends_and_grows():
    params, aux = random_scene(100, capacity=128, sh_degree=1)
    p2, a2 = add_sky_shell(params, aux, 100, np.zeros(3, np.float32), 30.0)
    assert int(a2.n_alive()) == 200
    assert p2.capacity >= 200
    # Sky rows sit right after the original alive rows at radius 30.
    r = np.linalg.norm(np.asarray(p2.xyz[100:200]), axis=1)
    np.testing.assert_allclose(r, 30.0, rtol=1e-4)


def test_sky_visible_in_render():
    from gsjax.config import RasterConfig
    from gsjax.render.api import render

    params, aux = random_scene(4, capacity=512, sh_degree=0, seed=2)
    # Kill the foreground so only sky contributes.
    aux = aux.replace(alive=jnp.zeros_like(aux.alive))
    params, aux = add_sky_shell(params, aux, 400, np.zeros(3, np.float32), 20.0)
    cam = look_at_origin_camera(width=64, height=48)
    out = render(
        params,
        cam,
        active_sh_degree=0,
        bg_color=jnp.zeros(3, jnp.float32),
        cfg=RasterConfig(max_instances=2**14, interpret=True),
        alive=aux.alive,
    )
    img = np.asarray(out.image)
    # The sky shell must paint sky color over most of the frame.
    assert img.mean() > 0.3
    assert np.isfinite(img).all()


def test_unbounded_prune_threshold_spares_far_shell():
    """The world-size prune (reference: scene/gaussian_model.py:398-401)
    deletes every splat with max scale > 0.1*extent. In skysphere mode the
    threshold scales with distance (densify_and_prune unbounded_center):
    a correctly-sized far shell splat survives, an equally-big NEAR splat
    is still pruned, and with unbounded_center=None the reference's flat
    cut applies to both."""
    import jax

    from gsjax.train.densify import densify_and_prune
    from gsjax.train.optimizer import adam_init

    extent = 5.0
    params, aux = random_scene(2, capacity=8, sh_degree=1, seed=0)
    big = float(np.log(0.2 * extent))  # max scale 1.0 > 0.1*extent = 0.5
    xyz = params.xyz.at[0].set(jnp.array([10 * extent, 0, 0]))  # far (sky)
    xyz = xyz.at[1].set(jnp.array([0.1, 0, 0]))  # near
    params = params.replace(
        xyz=xyz,
        scaling=params.scaling.at[:2].set(big),
        opacity=params.opacity.at[:2].set(3.0),  # clearly above min_opacity
    )
    opt = adam_init(params)
    kw = dict(
        grad_threshold=1e9, min_opacity=0.005, extent=extent,
        max_screen_size=20, percent_dense=0.01,
    )
    center = jnp.zeros(3, jnp.float32)

    _, aux_ref, _, stats_ref = densify_and_prune(
        params, aux, opt, jax.random.PRNGKey(0), **kw
    )
    assert int(stats_ref.n_alive) == 0  # flat cut kills both

    _, aux_sky, _, stats_sky = densify_and_prune(
        params, aux, opt, jax.random.PRNGKey(0),
        unbounded_center=center, **kw
    )
    assert int(stats_sky.n_alive) == 1  # far shell survives, near pruned
