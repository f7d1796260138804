"""Mesh-sharded training step: camera data-parallelism x tile-slab
parallelism, with Gaussian-parameter gradients psum'd over ICI.

Semantics vs the single-chip step (gsjax/train/step.py): the batch of
B = mesh.shape["data"] cameras is averaged — with B=1 this reproduces the
reference's one-camera-per-iteration loop exactly (reference:
train.py:76-128); B>1 is the camera-level data-parallel extension the
reference lacks (SURVEY.md §5.7). Densification statistics accumulate over
every camera in the batch (sums for grad-accum/denom, max for radii).

Loss sharding: the loss is computed on the LOCAL slab — O(slab) per-device
work, not O(full image). L1 is a masked local sum; SSIM needs a 5-pixel-row
halo (11x11 window), exchanged with the two slab neighbors via ppermute
(edge devices receive zeros, which IS the reference's zero-padded conv
boundary — utils/loss_utils.py:39-41 pads with window_size//2 zeros).

Gradient algebra: each device differentiates its OWN local objective
  obj_d = ((1-λ)·Σ|err| − λ·Σ ssim_map) / (C·H·W)   over its slab rows,
so total loss = Σ_d obj_d + λ and the true full gradient is the plain
psum of per-device grads — no collective appears inside the differentiated
scalar, so no dependence on psum/all_gather transpose conventions. Halo
cotangents flow back to the producing neighbor through ppermute's exact
transpose (the reversed permutation).
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
from gsjax.parallel.render import composite_slab, slab_rows
from gsjax.render.preprocess import preprocess
from gsjax.train.loss import ssim_map
from gsjax.train.optimizer import adam_update, make_lr_tree
from gsjax.train.step import StepMetrics, TrainState

_HALO = 5  # 11x11 SSIM window: window_size // 2 rows each side


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

    Returns step(state, views, projs, centers, tanx, tany, gt, bg,
    sh_degree=None) -> (state, metrics), where the leading batch axis B of
    views/projs/.../gt must equal mesh.shape["data"] and bg is [3]
    (replicated).

    SH ramp without recompiles: `sh_degree` is a TRACED replicated scalar
    operand — eval_sh masks the inactive bands (gsjax/core/sh.py), exactly
    like the single-device step, so one executable serves the whole ramp
    (reference: train.py:71-73 bumps the degree every 1000 iterations; a
    baked degree costs 4 multi-minute tunneled-TPU compiles per run).
    `active_sh_degree` is only the default used when the operand is omitted
    (then it constant-folds — the pre-round-4 baked behavior).
    """
    n_tile = mesh.shape["tile"]
    n_data = mesh.shape["data"]
    ts = raster_cfg.th
    rows = slab_rows(height, n_tile, ts)
    slab_px = rows * ts
    lam = opt_cfg.lambda_dssim
    npix = 3.0 * height * width

    def local_obj(mean_pix, conic, rgb, opacity, proj, gt, bg):
        """Per-device objective over this device's slab rows; the full-image
        loss is sum_over_tile(local_obj) + lambda_dssim. Differentiable in
        the four raster-level fields only — the param chain is applied AFTER
        the tile psum (see shard_body)."""
        tile_idx = lax.axis_index("tile")
        py0 = (tile_idx * slab_px).astype(jnp.float32)
        color, t, ninst = composite_slab(
            mean_pix, conic, rgb, opacity,
            proj.depth, proj.ext, proj.qmax,
            height=height, width=width, cfg=raster_cfg, py0=py0, rows=rows,
        )
        img = (
            color[:, :, :width]
            + t[None, :, :width] * bg[:, None, None]
        )
        # Rows past the true image height (padded tile grid on the last
        # slab) are zeroed: the full-image SSIM sees zero-padding there, and
        # zero img vs zero gt contributes nothing to L1.
        row_ids = tile_idx * slab_px + jnp.arange(slab_px)
        row_ok = (row_ids < height).astype(jnp.float32)
        img = img * row_ok[None, :, None]

        # Replicated gt: slice my slab plus halos, zero-padded at the ends.
        gt_pad = jnp.pad(
            gt,
            (
                (0, 0),
                (_HALO, n_tile * slab_px + _HALO - height),
                (0, 0),
            ),
        )
        gt_ext = lax.dynamic_slice_in_dim(
            gt_pad, tile_idx * slab_px, slab_px + 2 * _HALO, axis=1
        )

        # Halo exchange: 5 boundary rows from each slab neighbor. Devices
        # with no neighbor on that side receive ppermute's zero fill — the
        # reference conv's zero padding at the global image edge.
        if n_tile > 1:
            up_halo = lax.ppermute(
                img[:, -_HALO:, :], "tile",
                [(d, d + 1) for d in range(n_tile - 1)],
            )
            down_halo = lax.ppermute(
                img[:, :_HALO, :], "tile",
                [(d + 1, d) for d in range(n_tile - 1)],
            )
        else:
            up_halo = jnp.zeros_like(img[:, :_HALO, :])
            down_halo = up_halo
        img_ext = jnp.concatenate([up_halo, img, down_halo], axis=1)

        l1_sum = jnp.sum(jnp.abs(img - gt_ext[:, _HALO:-_HALO, :]))
        smap = ssim_map(img_ext, gt_ext, pad_h=False)
        ssim_sum = jnp.sum(smap * row_ok[None, :, None])
        obj = ((1.0 - lam) * l1_sum - lam * ssim_sum) / npix
        return obj, (ninst, l1_sum)

    def shard_body(
        params, alive, views, projs, centers, tanx, tany, gt, bg, sh_deg
    ):
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

        # Two-stage backward, split at the raster-field boundary so the
        # tile-axis collective moves the per-Gaussian RASTER cotangents
        # (mean_pix 2 + conic 3 + rgb 3 + opacity 1 = 9 floats/Gaussian)
        # instead of the full parameter gradient (59 floats/Gaussian with
        # SH3 f_rest) — ~6.5x less ICI traffic per step. The preprocess
        # chain is linear in these cotangents, so applying it once to the
        # psum'd fields is exact; it is replicated O(N) work each tile
        # device already did in the forward.
        def pre_fn(params, offset):
            proj = preprocess(
                xyz=params.xyz,
                sh=params.get_features(),
                opacity=params.get_opacity(),
                scaling=params.get_scaling(),
                rotation=params.rotation,
                camera=camera,
                active_sh_degree=sh_deg,
                mean2d_offset=offset,
                alive=alive,
            )
            return (proj.mean_pix, proj.conic, proj.rgb, proj.opacity), proj

        fields, pre_pull, proj = jax.vjp(
            pre_fn, params, offset, has_aux=True
        )
        obj, slab_pull, (ninst, l1_sum) = jax.vjp(
            lambda mp, co, rgb, op: local_obj(
                mp, co, rgb, op, proj, gt_img, bg
            ),
            *fields,
            has_aux=True,
        )
        d_fields = slab_pull(jnp.float32(1.0))
        # Each device differentiated its OWN slab objective, so the plain
        # psum over "tile" is the exact full-image raster cotangent (halo
        # cotangents already flowed back through ppermute's transpose).
        d_fields = jax.tree.map(lambda x: lax.psum(x, "tile"), d_fields)
        g_params, g_offset = pre_pull(d_fields)
        # "data" averages the camera batch (param grads only; the screen
        # grad g_offset keeps per-camera reference semantics).
        g_params = jax.tree.map(
            lambda x: lax.psum(x, "data") * (1.0 / n_data), g_params
        )
        radii = proj.radius
        loss = lax.psum(obj, "tile") + lam
        l1 = lax.psum(l1_sum, "tile") / npix

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
            P(),  # sh_degree (replicated traced scalar)
        ),
        out_specs=(P(), P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )

    def one_step(state, views, projs, centers, tanx, tany, gt, bg,
                 sh_degree=None):
        if sh_degree is None:
            sh_degree = active_sh_degree
        g_params, accum_d, denom_d, radii_max, loss, l1, ninst = sharded(
            state.params, state.aux.alive, views, projs, centers, tanx, tany,
            gt, bg, jnp.asarray(sh_degree, jnp.int32),
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
        sh_degree=None,
    ) -> tuple[TrainState, StepMetrics]:
        return one_step(
            state, views, projs, centers, tanx, tany, gt, bg, sh_degree
        )

    step.one_step = one_step

    # Raw sharded grads+stats (pre-Adam), exposed so tests can pin the
    # psum'd gradient against the single-device backward at tight tolerance.
    def sharded_grads(
        params, alive, views, projs, centers, tanx, tany, gt, bg,
        sh_degree=None,
    ):
        if sh_degree is None:
            sh_degree = active_sh_degree
        return sharded(
            params, alive, views, projs, centers, tanx, tany, gt, bg,
            jnp.asarray(sh_degree, jnp.int32),
        )

    step.sharded_grads = sharded_grads
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
    def steps(state, views, projs, centers, tanx, tany, gt, bgs,
              sh_degree=None):
        def body(s, xs):
            return one_step(s, *xs, sh_degree=sh_degree)

        return lax.scan(
            body, state, (views, projs, centers, tanx, tany, gt, bgs)
        )

    return steps
