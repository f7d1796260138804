"""Mesh-sharded rendering/training vs the single-device path (SURVEY.md §4:
sharded render must equal single-device render, reduction order aside)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.model import GaussianAux
from gsjax.parallel import make_mesh, render_sharded
from gsjax.parallel.step import make_sharded_train_step
from gsjax.render.api import render
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.optimizer import adam_init
from gsjax.train.step import TrainState, train_step

CFG = RasterConfig(max_instances=8192, interpret=True)
H = W = 64
SH_DEG = 1


@pytest.fixture(scope="module")
def scene():
    params, aux = random_scene(300, capacity=512, sh_degree=SH_DEG, seed=3)
    camera = look_at_origin_camera(width=W, height=H)
    return params, aux, camera


@pytest.mark.parametrize("data,tile", [(1, 4), (2, 2), (1, 1)])
def test_render_sharded_matches_single(scene, data, tile):
    params, aux, camera = scene
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    single = render(
        params, camera, active_sh_degree=SH_DEG, bg_color=bg, cfg=CFG,
        alive=aux.alive,
    ).image
    mesh = make_mesh(jax.devices()[: data * tile], data=data, tile=tile)
    sharded = render_sharded(
        params, camera, mesh=mesh, active_sh_degree=SH_DEG, bg_color=bg,
        cfg=CFG, alive=aux.alive,
    )
    np.testing.assert_allclose(
        np.asarray(sharded), np.asarray(single), atol=2e-5, rtol=1e-4
    )


def _bank_args(camera, gt, data):
    views = jnp.broadcast_to(camera.view, (data, 4, 4))
    projs = jnp.broadcast_to(camera.full_proj, (data, 4, 4))
    centers = jnp.broadcast_to(camera.cam_center, (data, 3))
    tanx = jnp.broadcast_to(camera.tan_fovx, (data,))
    tany = jnp.broadcast_to(camera.tan_fovy, (data,))
    gts = jnp.broadcast_to(gt, (data,) + gt.shape)
    return views, projs, centers, tanx, tany, gts


def _one_camera_bank(camera, gt):
    """Single-camera CameraBank whose pick() returns exactly (camera, gt)."""
    from gsjax.scene import CameraBank

    return CameraBank(
        views=camera.view[None],
        full_projs=camera.full_proj[None],
        centers=camera.cam_center[None],
        tan_fovx=camera.tan_fovx[None],
        tan_fovy=camera.tan_fovy[None],
        gt_rgb=jnp.round(gt * 255.0).astype(jnp.uint8)[None],
        alpha=jnp.full((1, 1) + gt.shape[1:], 255, jnp.uint8),
        width=camera.width,
        height=camera.height,
    )


@pytest.mark.parametrize("data,tile", [(1, 2), (1, 4), (2, 2)])
def test_sharded_grads_match_single(scene, data, tile):
    """Pre-Adam gradient parity: the psum'd sharded gradient equals the
    single-device backward at tight tolerance (the primary sharded-backward
    gate — tighter than comparing post-Adam params, where a sign flip of a
    ~zero gradient becomes a full ±lr step)."""
    from gsjax.train.step import _loss_and_render

    params, aux, camera = scene
    opt_cfg = OptimizationConfig()
    gt = jnp.tile(
        jnp.linspace(0, 1, H * W, dtype=jnp.float32).reshape(1, H, W), (3, 1, 1)
    )
    bg = jnp.asarray([0.2, 0.1, 0.4], jnp.float32)

    offset = jnp.zeros((params.capacity, 2), jnp.float32)
    (loss1, _), (g1, g1_off) = jax.value_and_grad(
        _loss_and_render, argnums=(0, 1), has_aux=True
    )(params, offset, camera, gt, bg, aux.alive, SH_DEG,
      opt_cfg.lambda_dssim, CFG)

    mesh = make_mesh(jax.devices()[: data * tile], data=data, tile=tile)
    step = make_sharded_train_step(
        mesh, height=H, width=W, active_sh_degree=SH_DEG, opt_cfg=opt_cfg,
        raster_cfg=CFG, spatial_lr_scale=1.0,
    )
    g2, _, _, _, loss2, _, _ = jax.jit(step.sharded_grads)(
        params, aux.alive, *_bank_args(camera, gt, data), bg
    )
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    alive = np.asarray(aux.alive)
    for name in ("xyz", "scaling", "opacity", "features_dc", "features_rest",
                 "rotation"):
        # Dead capacity slots are don't-care (their fill values NaN through
        # parts of the preprocess chain on both paths; densify rebuilds them
        # from scratch) — compare alive rows only.
        a = np.asarray(getattr(g2, name))[alive]
        b = np.asarray(getattr(g1, name))[alive]
        assert np.isfinite(b).all(), f"single-device {name} grads not finite"
        # atol covers two legitimate cross-path effects: f32 reduction-order
        # noise between the slab-partitioned and full-image sums (~6e-7 on
        # ~1e-4 gradients), and at most a borderline TERMINATION flip — the
        # slab path's chunk boundaries fall at different stream offsets, so
        # the log-space cumsum rounds differently and a pixel sitting
        # exactly at T = 1e-4 can include/skip one instance's contribution
        # (observed: a single element at ~4e-6 of a ~5e-4 gradient). Real
        # sharding bugs produce pervasive mismatches, not one-element ulp
        # cascades.
        np.testing.assert_allclose(
            a, b, atol=8e-6, rtol=2e-4,
            err_msg=f"gradient mismatch in {name}",
        )


def test_sharded_step_traced_sh_degree_matches_single(scene):
    """The mesh step's TRACED sh_degree operand controls the SH evaluation:
    a factory built with a different baked default, called with the traced
    degree, must reproduce the single-device gradient (the whole SH ramp
    rides one executable — reference train.py:71-73 bumps the degree every
    1000 iterations)."""
    from gsjax.train.step import _loss_and_render

    params, aux, camera = scene
    opt_cfg = OptimizationConfig()
    gt = jnp.tile(
        jnp.linspace(0, 1, H * W, dtype=jnp.float32).reshape(1, H, W),
        (3, 1, 1),
    )
    bg = jnp.asarray([0.2, 0.1, 0.4], jnp.float32)
    offset = jnp.zeros((params.capacity, 2), jnp.float32)
    (loss1, _), (g1, _) = jax.value_and_grad(
        _loss_and_render, argnums=(0, 1), has_aux=True
    )(params, offset, camera, gt, bg, aux.alive, SH_DEG,
      opt_cfg.lambda_dssim, CFG)

    mesh = make_mesh(jax.devices()[:4], data=2, tile=2)
    step = make_sharded_train_step(
        mesh, height=H, width=W, active_sh_degree=0,  # WRONG baked default
        opt_cfg=opt_cfg, raster_cfg=CFG, spatial_lr_scale=1.0,
    )
    g2, _, _, _, loss2, _, _ = jax.jit(step.sharded_grads)(
        params, aux.alive, *_bank_args(camera, gt, 2), bg,
        jnp.asarray(SH_DEG, jnp.int32),
    )
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    alive = np.asarray(aux.alive)
    for name in ("xyz", "features_dc", "features_rest"):
        np.testing.assert_allclose(
            np.asarray(getattr(g2, name))[alive],
            np.asarray(getattr(g1, name))[alive],
            # atol: see test_sharded_grads_match_single (same slab split,
            # same single borderline-termination-flip allowance).
            atol=8e-6, rtol=2e-4, err_msg=f"gradient mismatch in {name}",
        )


def test_sharded_grads_match_single_with_slab_overrun(scene):
    """Gradient parity when the padded slab grid overruns the image: at
    H=48 with 4 tile devices and 16px tile rows, device 3's slab is fully
    past the image and device 2's is partial — the out-of-range row
    masking and zero halos must reproduce the full-image loss exactly."""
    from gsjax.train.step import _loss_and_render

    params, aux, _ = scene
    h = 48
    camera = look_at_origin_camera(width=W, height=h)
    opt_cfg = OptimizationConfig()
    gt = jnp.tile(
        jnp.linspace(0, 1, h * W, dtype=jnp.float32).reshape(1, h, W), (3, 1, 1)
    )
    bg = jnp.asarray([0.3, 0.0, 0.1], jnp.float32)

    offset = jnp.zeros((params.capacity, 2), jnp.float32)
    (loss1, _), (g1, _) = jax.value_and_grad(
        _loss_and_render, argnums=(0, 1), has_aux=True
    )(params, offset, camera, gt, bg, aux.alive, SH_DEG,
      opt_cfg.lambda_dssim, CFG)

    mesh = make_mesh(jax.devices()[:4], data=1, tile=4)
    step = make_sharded_train_step(
        mesh, height=h, width=W, active_sh_degree=SH_DEG, opt_cfg=opt_cfg,
        raster_cfg=CFG, spatial_lr_scale=1.0,
    )
    g2, _, _, _, loss2, _, _ = jax.jit(step.sharded_grads)(
        params, aux.alive, *_bank_args(camera, gt, 1), bg
    )
    np.testing.assert_allclose(float(loss2), float(loss1), rtol=1e-5)
    alive = np.asarray(aux.alive)
    for name in ("xyz", "scaling", "opacity", "features_dc", "rotation"):
        # atol: the sharded path sums raster cotangents across slabs BEFORE
        # the preprocess chain, so rounding differs from the single-device
        # order (observed max ~2.6e-6 on ~1e-4 gradients).
        np.testing.assert_allclose(
            np.asarray(getattr(g2, name))[alive],
            np.asarray(getattr(g1, name))[alive],
            atol=4e-6, rtol=2e-4, err_msg=f"gradient mismatch in {name}",
        )


@pytest.mark.parametrize("data,tile", [(1, 2), (2, 2)])
def test_sharded_step_matches_single(scene, data, tile):
    """One sharded train step == one single-chip step on the same camera
    (with the camera replicated over the data axis, the batch mean is a
    no-op)."""
    params, aux, camera = scene
    opt_cfg = OptimizationConfig()
    gt = jnp.tile(
        jnp.linspace(0, 1, H * W, dtype=jnp.float32).reshape(1, H, W), (3, 1, 1)
    )
    gt = jnp.round(gt * 255.0) / 255.0  # match the uint8 bank quantization
    bg = jnp.zeros(3, jnp.float32)

    def fresh_state():
        # Copies: train_step donates its state, which would otherwise
        # delete the module-scoped fixture buffers.
        p = jax.tree.map(jnp.copy, params)
        return TrainState(
            params=p,
            opt=adam_init(p),
            aux=jax.tree.map(jnp.copy, aux),
            step=jnp.zeros((), jnp.int32),
        )

    s1, m1 = train_step(
        fresh_state(),
        _one_camera_bank(camera, gt),
        jnp.int32(0),
        bg,
        active_sh_degree=SH_DEG,
        opt_cfg=opt_cfg,
        raster_cfg=CFG,
        spatial_lr_scale=1.0,
    )

    mesh = make_mesh(jax.devices()[: data * tile], data=data, tile=tile)
    step = make_sharded_train_step(
        mesh,
        height=H,
        width=W,
        active_sh_degree=SH_DEG,
        opt_cfg=opt_cfg,
        raster_cfg=CFG,
        spatial_lr_scale=1.0,
    )
    s2, m2 = step(fresh_state(), *_bank_args(camera, gt, data), bg)

    assert np.isfinite(float(m2.loss))
    np.testing.assert_allclose(float(m2.loss), float(m1.loss), rtol=1e-5)
    for name in ("xyz", "scaling", "opacity", "features_dc", "rotation"):
        a = np.asarray(getattr(s2.params, name))
        b = np.asarray(getattr(s1.params, name))
        # Adam turns a sign flip of a ~zero gradient (reduction-order
        # noise across slabs) into a full +-lr step, so a tiny fraction of
        # elements may differ by up to 2*lr; everything else must match.
        bad = np.abs(a - b) > 5e-5 + 1e-3 * np.abs(b)
        assert bad.mean() < 0.005, (
            f"{name}: {bad.sum()}/{bad.size} mismatched, "
            f"max diff {np.abs(a - b).max():.3e}"
        )
    # Densification statistics agree (data axis replicates the camera, so
    # sums scale by `data`).
    np.testing.assert_allclose(
        np.asarray(s2.aux.denom), np.asarray(s1.aux.denom) * data, atol=1e-6
    )
    # rtol covers reduction-order noise in the screen-grad norms (the slab
    # loss sums in a different order than the full image; observed up to
    # ~4e-3 relative on ~1e-4-magnitude entries).
    np.testing.assert_allclose(
        np.asarray(s2.aux.xyz_grad_accum),
        np.asarray(s1.aux.xyz_grad_accum) * data,
        atol=1e-6,
        rtol=8e-3,
    )
    np.testing.assert_allclose(
        np.asarray(s2.aux.max_radii2d), np.asarray(s1.aux.max_radii2d), atol=0
    )
