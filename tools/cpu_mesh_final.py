"""Definitive CPU plain-vs-sharded grads comparison: both CHAINED through
the params (no cross-iteration concurrency), interleaved reps to cancel
machine-load drift."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.parallel.mesh import make_mesh
from gsjax.parallel.step import make_sharded_train_step
from gsjax.render.api import render
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.loss import l1_loss, ssim

W, H = 512, 256
N = 20_000
ITERS = 4
REPS = 3


def fence(x):
    _ = np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def main() -> None:
    params, aux = random_scene(
        N, capacity=N, sh_degree=2, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=W, height=H)
    cfg = RasterConfig(
        tile_w=32, tile_h=32, max_instances=131072, max_rows=65536,
        interpret=True,
    )
    opt_cfg = OptimizationConfig()
    gt = jnp.zeros((3, H, W), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    alive = aux.alive
    lam = opt_cfg.lambda_dssim

    def plain_loss(p, offset):
        out = render(
            p, camera, active_sh_degree=2, bg_color=bg, cfg=cfg,
            alive=alive, mean2d_offset=offset,
        )
        l1 = l1_loss(out.image, gt)
        return (1.0 - lam) * l1 + lam * (1.0 - ssim(out.image, gt))

    offset = jnp.zeros((params.capacity, 2), jnp.float32)

    @jax.jit
    def plain_chained(p):
        g = jax.grad(plain_loss)(p, offset)
        return jax.tree.map(lambda a, b: a - 0.0 * b, p, g)

    mesh = make_mesh(devices=jax.devices()[:1], data=1, tile=1)
    step = make_sharded_train_step(
        mesh, height=H, width=W, active_sh_degree=2, opt_cfg=opt_cfg,
        raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    sargs = (
        camera.view[None], camera.full_proj[None], camera.cam_center[None],
        camera.tan_fovx[None], camera.tan_fovy[None], gt[None], bg,
    )

    @jax.jit
    def sharded_chained(p):
        out = step.sharded_grads(p, alive, *sargs)
        return jax.tree.map(lambda a, b: a - 0.0 * b, p, out[0])

    def timed(fn, p0):
        p = fn(p0)
        fence(p)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            p = fn(p)
        fence(p)
        return (time.perf_counter() - t0) / ITERS * 1e3

    for rep in range(REPS):
        tp = timed(plain_chained, params)
        ts = timed(sharded_chained, params)
        print(
            f"rep {rep}: plain {tp:.0f} ms  sharded {ts:.0f} ms  "
            f"ratio {ts / tp:.2f}x",
            flush=True,
        )


if __name__ == "__main__":
    main()
