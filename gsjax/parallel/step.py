"""Mesh-sharded training step: camera data-parallelism x tile-slab
parallelism, with Gaussian-parameter gradients psum'd over ICI.

Semantics vs the single-chip step (gsjax/train/step.py): the batch of
B = mesh.shape["data"] cameras is averaged — with B=1 this reproduces the
reference's one-camera-per-iteration loop exactly (reference:
train.py:76-128); B>1 is the camera-level data-parallel extension the
reference lacks (SURVEY.md §5.7). Densification statistics accumulate over
every camera in the batch (sums for grad-accum/denom, max for radii).

Gradient algebra: inside the "tile" group every device computes the SAME
full-image loss (after an all_gather of slabs), so the all_gather transpose
(a psum_scatter) hands each device n_tile x its true slab cotangent; the
per-Gaussian grads are therefore psum'd over "tile" and divided by n_tile,
then pmean'd over "data".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.core.cameras import Camera
from gsjax.model import GaussianAux
from gsjax.parallel.render import render_slab, slab_rows
from gsjax.train.loss import l1_loss, ssim
from gsjax.train.optimizer import adam_update, make_lr_tree
from gsjax.train.step import StepMetrics, TrainState


def make_sharded_train_step(
    mesh: Mesh,
    *,
    height: int,
    width: int,
    active_sh_degree: int,
    opt_cfg: OptimizationConfig,
    raster_cfg: RasterConfig,
    spatial_lr_scale: float,
):
    """Build the jitted sharded train step.

    Returns step(state, views, projs, centers, tanx, tany, gt, bg) ->
    (state, metrics), where the leading batch axis B of views/projs/.../gt
    must equal mesh.shape["data"] and bg is [3] (replicated).
    """
    n_tile = mesh.shape["tile"]
    n_data = mesh.shape["data"]
    ts = raster_cfg.th
    rows = slab_rows(height, n_tile, ts)

    def local_loss(params, offset, camera, gt, bg, alive):
        py0 = (lax.axis_index("tile") * rows * ts).astype(jnp.float32)
        color, t, radii, ninst = render_slab(
            params,
            camera,
            active_sh_degree=active_sh_degree,
            cfg=raster_cfg,
            py0=py0,
            rows=rows,
            mean2d_offset=offset,
            alive=alive,
        )
        full_c = lax.all_gather(color, "tile", axis=1, tiled=True)
        full_t = lax.all_gather(t, "tile", axis=0, tiled=True)
        image = (
            full_c[:, :height, :width]
            + full_t[None, :height, :width] * bg[:, None, None]
        )
        l1 = l1_loss(image, gt)
        loss = (1.0 - opt_cfg.lambda_dssim) * l1 + opt_cfg.lambda_dssim * (
            1.0 - ssim(image, gt)
        )
        return loss, (radii, ninst, l1)

    def shard_body(params, alive, views, projs, centers, tanx, tany, gt, bg):
        # Local shapes: views [1,4,4], gt [1,3,H,W] (B sharded over "data").
        camera = Camera(
            view=views[0],
            full_proj=projs[0],
            cam_center=centers[0],
            tan_fovx=tanx[0],
            tan_fovy=tany[0],
            width=width,
            height=height,
        )
        gt_img = gt[0]
        offset = jnp.zeros((params.capacity, 2), jnp.float32)
        (loss, (radii, ninst, l1)), (g_params, g_offset) = jax.value_and_grad(
            local_loss, argnums=(0, 1), has_aux=True
        )(params, offset, camera, gt_img, bg, alive)

        # psum over tile = n_tile * (true per-camera grad): each slab term
        # carries the n_tile-scaled cotangent. One division by n_tile, then
        # the data-batch mean.
        scale = 1.0 / (n_tile * n_data)
        g_params = jax.tree.map(
            lambda x: lax.psum(x, ("tile", "data")) * scale, g_params
        )
        g_offset = lax.psum(g_offset, "tile") * (1.0 / n_tile)

        # Densification stat deltas, accumulated over the camera batch
        # (reference per-camera semantics: train.py:115-116).
        visible = radii > 0
        norm = jnp.linalg.norm(g_offset, axis=-1)
        accum_delta = lax.psum(jnp.where(visible, norm, 0.0), "data")
        denom_delta = lax.psum(visible.astype(jnp.float32), "data")
        radii_max = lax.pmax(
            jnp.where(visible, radii.astype(jnp.float32), 0.0), "data"
        )

        loss = lax.pmean(loss, "data")
        l1 = lax.pmean(l1, "data")
        ninst = lax.pmax(ninst, ("tile", "data"))
        return g_params, accum_delta, denom_delta, radii_max, loss, l1, ninst

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(
            P(),  # params (replicated)
            P(),  # alive
            P("data"),  # views
            P("data"),  # full_projs
            P("data"),  # centers
            P("data"),  # tan_fovx
            P("data"),  # tan_fovy
            P("data"),  # gt
            P(),  # bg
        ),
        out_specs=(P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    def one_step(state, views, projs, centers, tanx, tany, gt, bg):
        g_params, accum_d, denom_d, radii_max, loss, l1, ninst = sharded(
            state.params, state.aux.alive, views, projs, centers, tanx, tany,
            gt, bg,
        )
        aux = GaussianAux(
            alive=state.aux.alive,
            max_radii2d=jnp.maximum(state.aux.max_radii2d, radii_max),
            xyz_grad_accum=state.aux.xyz_grad_accum + accum_d,
            denom=state.aux.denom + denom_d,
        )
        lr_tree = make_lr_tree(opt_cfg, spatial_lr_scale, state.step)
        new_params, new_opt = adam_update(
            g_params, state.opt, state.params, lr_tree
        )
        new_state = TrainState(
            params=new_params, opt=new_opt, aux=aux, step=state.step + 1
        )
        return new_state, StepMetrics(
            loss=loss, l1=l1, num_instances=ninst[0], num_rows=ninst[1]
        )

    @functools.partial(jax.jit, donate_argnames=("state",))
    def step(
        state: TrainState,
        views: jnp.ndarray,
        projs: jnp.ndarray,
        centers: jnp.ndarray,
        tanx: jnp.ndarray,
        tany: jnp.ndarray,
        gt: jnp.ndarray,
        bg: jnp.ndarray,
    ) -> tuple[TrainState, StepMetrics]:
        return one_step(state, views, projs, centers, tanx, tany, gt, bg)

    step.one_step = one_step
    return step


def make_sharded_train_steps(
    mesh: Mesh,
    *,
    height: int,
    width: int,
    active_sh_degree: int,
    opt_cfg: OptimizationConfig,
    raster_cfg: RasterConfig,
    spatial_lr_scale: float,
):
    """Scanned multi-step window over the sharded step (the mesh-path twin
    of gsjax.train.step.train_steps): one dispatch drives W optimizer
    updates on-device, removing the per-step host round trip the
    single-step path pays.

    Returns steps(state, views [W,B,4,4], projs, centers, tanx, tany,
    gt [W,B,3,H,W], bgs [W,3]) -> (state, metrics with [W]-leading leaves),
    where B = mesh.shape["data"].
    """
    single = make_sharded_train_step(
        mesh,
        height=height,
        width=width,
        active_sh_degree=active_sh_degree,
        opt_cfg=opt_cfg,
        raster_cfg=raster_cfg,
        spatial_lr_scale=spatial_lr_scale,
    )
    one_step = single.one_step

    @functools.partial(jax.jit, donate_argnames=("state",))
    def steps(state, views, projs, centers, tanx, tany, gt, bgs):
        def body(s, xs):
            return one_step(s, *xs)

        return lax.scan(
            body, state, (views, projs, centers, tanx, tany, gt, bgs)
        )

    return steps
