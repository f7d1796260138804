"""Renderer consistency tests: oracle vs pure-JAX tiled vs Pallas kernels
(interpret mode on CPU), forward images AND input gradients.

This is the heart of the test strategy (SURVEY.md section 4): the naive
O(N*pixels) oracle is the executable spec; the tiled paths must match it.
One canonical scene/camera is shared module-wide to amortize XLA compiles
on the small CI machine.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.config import RasterConfig
from gsjax.render.api import render, render_oracle
from gsjax.render.binning import bin_gaussians, num_tiles
from gsjax.render.common import build_inst_data, untile_image
from gsjax.render.preprocess import preprocess
from gsjax.render.tiled_jax import composite_tiles_jax

from tests.scene_utils import look_at_origin_camera, orbit_camera, random_scene

CFG = RasterConfig(tile_size=16, chunk=128, max_instances=1 << 14, interpret=True)
W, H = 64, 48
BG = jnp.array([0.2, 0.3, 0.4])


@pytest.fixture(scope="module")
def scene():
    params, aux = random_scene(200, seed=0)
    return params, aux


@pytest.fixture(scope="module")
def camera():
    return look_at_origin_camera(W, H)


@pytest.fixture(scope="module")
def oracle_image(scene, camera):
    params, aux = scene
    return np.asarray(
        render_oracle(params, camera, active_sh_degree=3, bg_color=BG, alive=aux.alive)
    )


def _proj(params, camera, alive=None, offset=None):
    return preprocess(
        xyz=params.xyz,
        sh=params.get_features(),
        opacity=params.get_opacity(),
        scaling=params.get_scaling(),
        rotation=params.rotation,
        camera=camera,
        active_sh_degree=params.max_sh_degree,
        mean2d_offset=offset,
        alive=alive,
    )


class TestForward:
    def test_tiled_jax_matches_oracle(self, scene, camera, oracle_image):
        params, aux = scene
        proj = _proj(params, camera, aux.alive)
        binning = bin_gaussians(
            proj.mean_pix, proj.depth, proj.ext, proj.conic, proj.qmax,
            camera.height, camera.width, CFG,
        )
        tiles_x, tiles_y = num_tiles(camera.height, camera.width, CFG.tile_size)
        from gsjax.render.composite import pack_fields

        fields = pack_fields(proj.mean_pix, proj.conic, proj.rgb, proj.opacity)
        inst = build_inst_data(
            jnp.take(fields, binning.perm, axis=0), binning.sorted_owner
        )
        tc, tt = composite_tiles_jax(
            inst, binning, tiles_x * tiles_y, tiles_x, CFG.tw, CFG.th, CFG.chunk
        )
        color, trans = untile_image(
            tc, tt, camera.height, camera.width, tiles_x, tiles_y, CFG.tile_size
        )
        img_tiled = color + trans[None] * BG[:, None, None]
        np.testing.assert_allclose(
            np.asarray(img_tiled), oracle_image, atol=2e-3, rtol=1e-3
        )

    def test_pallas_matches_oracle(self, scene, camera, oracle_image):
        params, aux = scene
        out = render(
            params, camera, active_sh_degree=3, bg_color=BG, cfg=CFG, alive=aux.alive
        )
        assert out.image.shape == (3, H, W)
        np.testing.assert_allclose(
            np.asarray(out.image), oracle_image, atol=2e-3, rtol=1e-3
        )
        assert int(out.num_instances) > 0

    def test_fast_fwd_close_to_exact_and_guarded(self, scene, camera,
                                                 oracle_image):
        """RasterConfig.fast_fwd (inference-only bf16 cumsums) stays within
        display accuracy of the exact forward, and differentiating it
        raises instead of silently returning inconsistent gradients."""
        import dataclasses

        params, aux = scene
        fast_cfg = dataclasses.replace(CFG, fast_fwd=True)
        img = np.asarray(
            render(
                params, camera, active_sh_degree=3, bg_color=BG,
                cfg=fast_cfg, alive=aux.alive,
            ).image
        )
        err = np.abs(img - oracle_image).max()
        assert err < 4e-3, f"fast_fwd max error {err} vs oracle"  # < 1/255

        def loss(p):
            return jnp.sum(
                render(
                    p, camera, active_sh_degree=3, bg_color=BG,
                    cfg=fast_cfg, alive=aux.alive,
                ).image
            )

        with pytest.raises(ValueError, match="fast_fwd"):
            jax.grad(loss)(params)

    def test_background_only(self, scene, camera):
        params, aux = scene
        # Move all gaussians behind the camera -> pure background image.
        far = params.replace(xyz=params.xyz - jnp.array([0.0, 0.0, 50.0]))
        out = render(
            far, camera, active_sh_degree=3, bg_color=BG, cfg=CFG, alive=aux.alive
        )
        np.testing.assert_allclose(
            np.asarray(out.image),
            np.broadcast_to(np.asarray(BG)[:, None, None], (3, H, W)),
            atol=1e-6,
        )
        assert int(jnp.sum(out.radii > 0)) == 0

    def test_alive_mask_excludes_dead(self, scene, camera):
        params, aux = scene
        # Kill the second half: must equal rendering only the first half.
        half_alive = aux.alive & (jnp.arange(params.capacity) < 100)
        out_masked = render(
            params, camera, active_sh_degree=3, bg_color=BG, cfg=CFG, alive=half_alive
        )
        img_half = render_oracle(
            params, camera, active_sh_degree=3, bg_color=BG, alive=half_alive
        )
        np.testing.assert_allclose(
            np.asarray(out_masked.image), np.asarray(img_half), atol=2e-3, rtol=1e-3
        )
        out_all = render(
            params, camera, active_sh_degree=3, bg_color=BG, cfg=CFG, alive=aux.alive
        )
        assert not np.allclose(np.asarray(out_all.image), np.asarray(out_masked.image))

    def test_orbit_view_matches_oracle(self, scene):
        params, aux = scene
        cam = orbit_camera(0.7, width=W, height=H)
        img_o = render_oracle(
            params, cam, active_sh_degree=3, bg_color=BG, alive=aux.alive
        )
        out = render(
            params, cam, active_sh_degree=3, bg_color=BG, cfg=CFG, alive=aux.alive
        )
        np.testing.assert_allclose(
            np.asarray(out.image), np.asarray(img_o), atol=2e-3, rtol=1e-3
        )


class TestGradients:
    def test_pallas_grads_match_oracle(self, scene, camera):
        params, aux = scene
        target = jnp.zeros((3, H, W))
        offset = jnp.zeros((params.capacity, 2))

        def loss_tiled(p, off):
            out = render(
                p, camera, active_sh_degree=3, bg_color=BG, cfg=CFG,
                alive=aux.alive, mean2d_offset=off,
            )
            return jnp.mean((out.image - target) ** 2)

        def loss_oracle(p, off):
            img = render_oracle(
                p, camera, active_sh_degree=3, bg_color=BG,
                alive=aux.alive, mean2d_offset=off,
            )
            return jnp.mean((img - target) ** 2)

        g_tiled = jax.grad(loss_tiled, (0, 1))(params, offset)
        g_oracle = jax.grad(loss_oracle, (0, 1))(params, offset)

        for name in ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity"):
            a = np.asarray(getattr(g_tiled[0], name))
            b = np.asarray(getattr(g_oracle[0], name))
            scale = max(np.abs(b).max(), 1e-8)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-3, err_msg=f"grad mismatch for {name}"
            )
        # Screen-space (NDC) offset gradient — the densification signal.
        a, b = np.asarray(g_tiled[1]), np.asarray(g_oracle[1])
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-3)
        assert np.abs(b).max() > 0.0

    def test_strip_skip_grads_match_oracle(self, scene, camera):
        """strips>1 exercises the backward kernel's per-strip skip + shared
        carry accumulation; gradients must still match the oracle."""
        params, aux = scene
        cfg = RasterConfig(
            tile_w=32, tile_h=16, strips=2, chunk=128,
            max_instances=1 << 14, interpret=True,
        )
        target = jnp.zeros((3, H, W))
        offset = jnp.zeros((params.capacity, 2))

        def loss_tiled(p, off):
            out = render(
                p, camera, active_sh_degree=3, bg_color=BG, cfg=cfg,
                alive=aux.alive, mean2d_offset=off,
            )
            return jnp.mean((out.image - target) ** 2)

        def loss_oracle(p, off):
            img = render_oracle(
                p, camera, active_sh_degree=3, bg_color=BG,
                alive=aux.alive, mean2d_offset=off,
            )
            return jnp.mean((img - target) ** 2)

        g_tiled = jax.grad(loss_tiled, (0, 1))(params, offset)
        g_oracle = jax.grad(loss_oracle, (0, 1))(params, offset)
        for name in ("xyz", "features_dc", "scaling", "rotation", "opacity"):
            a = np.asarray(getattr(g_tiled[0], name))
            b = np.asarray(getattr(g_oracle[0], name))
            scale = max(np.abs(b).max(), 1e-8)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-3,
                err_msg=f"grad mismatch for {name}",
            )
        a, b = np.asarray(g_tiled[1]), np.asarray(g_oracle[1])
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-3)

    def test_grads_zero_for_dead_slots(self, scene, camera):
        params, aux = scene
        half_alive = aux.alive & (jnp.arange(params.capacity) < 100)
        target = jnp.full((3, H, W), 0.5)

        def loss(p, off):
            out = render(
                p, camera, active_sh_degree=3, bg_color=BG, cfg=CFG,
                alive=half_alive, mean2d_offset=off,
            )
            return jnp.mean((out.image - target) ** 2)

        g, g_off = jax.grad(loss, (0, 1))(params, jnp.zeros((params.capacity, 2)))
        np.testing.assert_array_equal(np.asarray(g.xyz[100:]), 0.0)
        np.testing.assert_array_equal(np.asarray(g.opacity[100:]), 0.0)
        np.testing.assert_array_equal(np.asarray(g_off[100:]), 0.0)
        assert np.abs(np.asarray(g.xyz[:100])).max() > 0


class TestRenderHooks:
    """The reference front-end's optional paths (gaussian_renderer/
    __init__.py:18-93): override_color, scaling_modifier, the
    --convert_SHs_python / --compute_cov3D_python mirror paths, and
    markVisible."""

    def test_override_color(self, scene, camera):
        params, aux = scene
        red = jnp.tile(jnp.asarray([[1.0, 0.0, 0.0]]), (params.capacity, 1))
        out = render(
            params, camera, active_sh_degree=3, bg_color=jnp.zeros(3),
            cfg=CFG, alive=aux.alive, override_color=red,
        )
        img = np.asarray(out.image)
        # Foreground is pure red: G/B channels only ever see background (0).
        assert img[0].max() > 0.1
        np.testing.assert_allclose(img[1], 0.0, atol=1e-6)
        np.testing.assert_allclose(img[2], 0.0, atol=1e-6)

    def test_mirror_paths_match_default(self, scene, camera, oracle_image):
        params, aux = scene
        out = render(
            params, camera, active_sh_degree=3, bg_color=BG, cfg=CFG,
            alive=aux.alive, compute_cov3d_outside=True,
            convert_shs_outside=True,
        )
        np.testing.assert_allclose(
            np.asarray(out.image), oracle_image, atol=2e-3, rtol=1e-3
        )

    def test_scaling_modifier_shrinks_coverage(self, scene, camera):
        params, aux = scene
        big = render(
            params, camera, active_sh_degree=3, bg_color=BG, cfg=CFG,
            alive=aux.alive, scaling_modifier=1.0,
        )
        tiny = render(
            params, camera, active_sh_degree=3, bg_color=BG, cfg=CFG,
            alive=aux.alive, scaling_modifier=0.1,
        )
        assert int(tiny.num_instances) < int(big.num_instances)
        # Matches the oracle at the modified scale too.
        ref = render_oracle(
            params, camera, active_sh_degree=3, bg_color=BG,
            alive=aux.alive, scaling_modifier=0.1,
        )
        np.testing.assert_allclose(
            np.asarray(tiny.image), np.asarray(ref), atol=2e-3, rtol=1e-3
        )

    def test_mark_visible(self, scene, camera):
        from gsjax.render.api import mark_visible

        params, aux = scene
        vis = np.asarray(mark_visible(params.xyz, camera))
        assert vis.any()
        behind = params.xyz - jnp.array([0.0, 0.0, 50.0])
        assert not np.asarray(mark_visible(behind, camera)).any()


class TestRectTiles:
    """Rectangular tile shapes (RasterConfig.tile_w/tile_h). Bigger tiles
    shrink the (gaussian, tile) pair count that every instance-rate stage
    pays for; parity with the oracle must be shape-independent."""

    @pytest.mark.parametrize("tw,th", [(32, 16), (32, 32), (8, 16), (64, 32)])
    def test_forward_matches_oracle(self, scene, camera, oracle_image, tw, th):
        params, aux = scene
        cfg = RasterConfig(
            tile_w=tw, tile_h=th, chunk=128, max_instances=1 << 14,
            interpret=True,
        )
        out = render(
            params, camera, active_sh_degree=3, bg_color=BG, cfg=cfg,
            alive=aux.alive,
        )
        np.testing.assert_allclose(
            np.asarray(out.image), oracle_image, atol=2e-3, rtol=1e-3
        )

    def test_grads_match_oracle_32x16(self, scene, camera):
        params, aux = scene
        cfg = RasterConfig(
            tile_w=32, tile_h=16, chunk=128, max_instances=1 << 14,
            interpret=True,
        )
        target = jnp.zeros((3, H, W))
        offset = jnp.zeros((params.capacity, 2))

        def loss_tiled(p, off):
            out = render(
                p, camera, active_sh_degree=3, bg_color=BG, cfg=cfg,
                alive=aux.alive, mean2d_offset=off,
            )
            return jnp.mean((out.image - target) ** 2)

        def loss_oracle(p, off):
            img = render_oracle(
                p, camera, active_sh_degree=3, bg_color=BG,
                alive=aux.alive, mean2d_offset=off,
            )
            return jnp.mean((img - target) ** 2)

        g_tiled = jax.grad(loss_tiled, (0, 1))(params, offset)
        g_oracle = jax.grad(loss_oracle, (0, 1))(params, offset)
        for name in ("xyz", "scaling", "rotation", "opacity"):
            a = np.asarray(getattr(g_tiled[0], name))
            b = np.asarray(getattr(g_oracle[0], name))
            scale = max(np.abs(b).max(), 1e-8)
            np.testing.assert_allclose(
                a / scale, b / scale, atol=5e-3, err_msg=f"grad mismatch {name}"
            )
        a, b = np.asarray(g_tiled[1]), np.asarray(g_oracle[1])
        scale = max(np.abs(b).max(), 1e-8)
        np.testing.assert_allclose(a / scale, b / scale, atol=5e-3)

    @pytest.mark.parametrize("strips", [2, 4])
    def test_strip_skip_matches_oracle(self, scene, camera, oracle_image, strips):
        """Strip-granular early termination is an exact no-op transform."""
        params, aux = scene
        cfg = RasterConfig(
            tile_w=32, tile_h=16, strips=strips, chunk=128,
            max_instances=1 << 14, interpret=True,
        )
        out = render(
            params, camera, active_sh_degree=3, bg_color=BG, cfg=cfg,
            alive=aux.alive,
        )
        np.testing.assert_allclose(
            np.asarray(out.image), oracle_image, atol=2e-3, rtol=1e-3
        )
