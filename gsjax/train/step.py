"""The jitted training step: render -> L1+SSIM loss -> backward -> Adam.

Mirrors the reference hot loop body (reference: train.py:69-128) as one pure
function, compiled once per (image size, SH degree, capacity). The
screen-space position gradient that the reference extracts from its dummy
means2D tensor is obtained by differentiating w.r.t. an explicit zero
`mean2d_offset` argument in the same backward pass.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.core.cameras import Camera
from gsjax.model import GaussianAux, GaussianParams
from gsjax.render.api import render
from gsjax.train.densify import add_densification_stats
from gsjax.train.loss import l1_loss, ssim
from gsjax.train.optimizer import AdamState, adam_update, make_lr_tree


@flax.struct.dataclass
class TrainState:
    params: GaussianParams
    opt: AdamState
    aux: GaussianAux
    step: jnp.ndarray  # [] int32, 1-based like the reference loop


@flax.struct.dataclass
class StepMetrics:
    loss: jnp.ndarray
    l1: jnp.ndarray
    num_instances: jnp.ndarray
    num_rows: jnp.ndarray


def _loss_and_render(
    params: GaussianParams,
    offset: jnp.ndarray,
    camera: Camera,
    gt_image: jnp.ndarray,
    bg: jnp.ndarray,
    alive: jnp.ndarray,
    active_sh_degree: int,
    lambda_dssim: float,
    raster_cfg: RasterConfig,
):
    out = render(
        params,
        camera,
        active_sh_degree=active_sh_degree,
        bg_color=bg,
        cfg=raster_cfg,
        alive=alive,
        mean2d_offset=offset,
    )
    l1 = l1_loss(out.image, gt_image)
    loss = (1.0 - lambda_dssim) * l1 + lambda_dssim * (1.0 - ssim(out.image, gt_image))
    return loss, (out, l1)


def _step_core(
    state: TrainState,
    bank,
    cam_idx: jnp.ndarray,
    bg: jnp.ndarray,
    active_sh_degree: int | jnp.ndarray,
    opt_cfg: OptimizationConfig,
    raster_cfg: RasterConfig,
    spatial_lr_scale: float,
) -> tuple[TrainState, StepMetrics]:
    camera, gt_image = bank.pick(cam_idx)
    offset = jnp.zeros((state.params.capacity, 2), jnp.float32)
    (loss, (out, l1)), (g_params, g_offset) = jax.value_and_grad(
        _loss_and_render, argnums=(0, 1), has_aux=True
    )(
        state.params,
        offset,
        camera,
        gt_image,
        bg,
        state.aux.alive,
        active_sh_degree,
        opt_cfg.lambda_dssim,
        raster_cfg,
    )

    aux = add_densification_stats(state.aux, out.radii, g_offset)

    lr_tree = make_lr_tree(opt_cfg, spatial_lr_scale, state.step)
    new_params, new_opt = adam_update(g_params, state.opt, state.params, lr_tree)

    new_state = TrainState(
        params=new_params, opt=new_opt, aux=aux, step=state.step + 1
    )
    metrics = StepMetrics(
        loss=loss, l1=l1, num_instances=out.num_instances, num_rows=out.num_rows
    )
    return new_state, metrics


@functools.partial(
    jax.jit,
    # active_sh_degree is a TRACED scalar (weak-typed int), not static:
    # the SH ramp (0->3) would otherwise compile the step once per
    # degree — minutes per compile on a tunneled TPU. eval_sh masks
    # inactive bands, the exact same linear map as degree truncation.
    static_argnames=("opt_cfg", "raster_cfg", "spatial_lr_scale"),
    donate_argnames=("state",),
)
def train_step(
    state: TrainState,
    bank,
    cam_idx: jnp.ndarray,
    bg: jnp.ndarray,
    *,
    active_sh_degree: int | jnp.ndarray,
    opt_cfg: OptimizationConfig,
    raster_cfg: RasterConfig,
    spatial_lr_scale: float,
) -> tuple[TrainState, StepMetrics]:
    """One optimization iteration.

    Args:
      state: donated; params/opt/aux are updated in place.
      bank: CameraBank holding the views + device-resident GT images.
      cam_idx: [] int32 — the sampled view (gathered on device).
      bg: [3] background for this step (random when random_background).
    """
    return _step_core(
        state, bank, cam_idx, bg, active_sh_degree, opt_cfg, raster_cfg,
        spatial_lr_scale,
    )


@functools.partial(
    jax.jit,
    # active_sh_degree is a TRACED scalar (weak-typed int), not static:
    # the SH ramp (0->3) would otherwise compile the step once per
    # degree — minutes per compile on a tunneled TPU. eval_sh masks
    # inactive bands, the exact same linear map as degree truncation.
    static_argnames=("opt_cfg", "raster_cfg", "spatial_lr_scale"),
    donate_argnames=("state",),
)
def train_steps(
    state: TrainState,
    bank,
    cam_indices: jnp.ndarray,
    bgs: jnp.ndarray,
    *,
    active_sh_degree: int | jnp.ndarray,
    opt_cfg: OptimizationConfig,
    raster_cfg: RasterConfig,
    spatial_lr_scale: float,
) -> tuple[TrainState, StepMetrics]:
    """A scanned window of W iterations in ONE dispatch.

    Per-step host round trips dominate wall-clock when the host-device
    link is slow; the trainer batches the iterations between densify /
    logging boundaries through this scan. cam_indices: [W] int32;
    bgs: [W, 3]. Returns per-step metrics stacked along the window.
    """

    def one(st, xs):
        idx, bg = xs
        st, metrics = _step_core(
            st, bank, idx, bg, active_sh_degree, opt_cfg, raster_cfg,
            spatial_lr_scale,
        )
        return st, metrics

    return jax.lax.scan(one, state, (cam_indices, bgs))
