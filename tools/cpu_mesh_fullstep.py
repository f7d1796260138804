"""Where is the full sharded step's extra cost? Time sharded_grads (raw
shard_map grads+stats) vs the full jitted sharded step on CPU."""

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
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.optimizer import adam_init
from gsjax.train.step import TrainState

W, H = 512, 256
N = 20_000
ITERS = 6


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
    mesh = make_mesh(devices=jax.devices()[:1], data=1, tile=1)
    step = make_sharded_train_step(
        mesh, height=H, width=W, active_sh_degree=2,
        opt_cfg=OptimizationConfig(), raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    gt = jnp.zeros((3, H, W), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    sargs = (
        camera.view[None], camera.full_proj[None], camera.cam_center[None],
        camera.tan_fovx[None], camera.tan_fovy[None], gt[None], bg,
    )

    # Chain iterations through the params (p - 0*g) so successive dispatches
    # CANNOT run concurrently on the CPU thread pool — unchained same-input
    # loops overlap across iterations and under-measure by ~2-3x.
    @jax.jit
    def grads_chained(p, alive, *args):
        out = step.sharded_grads(p, alive, *args)
        g = out[0]
        newp = jax.tree.map(lambda a, b: a - 0.0 * b, p, g)
        return newp, out[4]

    p = params
    p, loss = grads_chained(p, aux.alive, *sargs)
    fence(loss)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        p, loss = grads_chained(p, aux.alive, *sargs)
    fence(loss)
    fence(p)
    print(f"sharded_grads chained: {(time.perf_counter()-t0)/ITERS*1e3:.0f} ms",
          flush=True)

    def fresh():
        p = jax.tree.map(jnp.array, params)
        a = jax.tree.map(jnp.array, aux)
        return TrainState(params=p, opt=adam_init(p), aux=a,
                          step=jnp.zeros((), jnp.int32))

    s = fresh()
    s, _ = step(s, *sargs)
    fence(s.params)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s, _ = step(s, *sargs)
    fence(s.params)
    print(f"full sharded step:  {(time.perf_counter()-t0)/ITERS*1e3:.0f} ms",
          flush=True)

    # one_step without donation, jitted fresh
    one = jax.jit(step.one_step)
    s2 = fresh()
    s2, _ = one(s2, *sargs)
    fence(s2.params)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        s2, _ = one(s2, *sargs)
    fence(s2.params)
    print(f"one_step (no donate): {(time.perf_counter()-t0)/ITERS*1e3:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
