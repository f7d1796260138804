"""Pin down WHERE bench_mesh_overhead's 7 s/step sharded number comes from.

trace_step.py --sharded measures the SAME make_sharded_train_step graph at
125 ms/step (parity with plain) while bench_mesh_overhead.py measured
7041 ms/step. The two harnesses differ in dispatch discipline: the trace
tool device_gets the loss every iteration (one dispatch in flight), the
overhead bench queues 15 donated-state dispatches back-to-back before its
single fence. This probe times the sharded step under both disciplines,
plus the plain step for reference, in one process.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()
import numpy as np

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.parallel.mesh import make_mesh
from gsjax.parallel.step import make_sharded_train_step
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.optimizer import adam_init
from gsjax.train.step import TrainState

W, H = 1920, 1080
N = 500_000
ITERS = 8


def main() -> None:
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=W, height=H)
    cfg = RasterConfig(
        tile_w=32, tile_h=32, max_instances=1_179_648, max_rows=524_288,
    )
    mesh = make_mesh(jax.devices()[:1], data=1, tile=1)
    step = make_sharded_train_step(
        mesh, height=H, width=W, active_sh_degree=3,
        opt_cfg=OptimizationConfig(), raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    gt = jnp.zeros((3, H, W), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    args = (
        camera.view[None], camera.full_proj[None], camera.cam_center[None],
        camera.tan_fovx[None], camera.tan_fovy[None], gt[None], bg,
    )
    state = TrainState(
        params=params, opt=adam_init(params), aux=aux,
        step=jnp.zeros((), jnp.int32),
    )

    # Warm up (compile) + sync.
    for _ in range(2):
        state, metrics = step(state, *args)
    _ = np.asarray(jax.device_get(metrics.loss))

    # (a) synced: fetch the loss every iteration (trace_step discipline).
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, *args)
        _ = np.asarray(jax.device_get(metrics.loss))
    synced = (time.perf_counter() - t0) / ITERS * 1000
    print(f"sharded, fetch-per-step:   {synced:8.2f} ms", flush=True)

    # (b) queued: ITERS dispatches, one fence (bench_mesh_overhead
    # discipline).
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = step(state, *args)
    _ = np.asarray(jax.device_get(metrics.loss))
    queued = (time.perf_counter() - t0) / ITERS * 1000
    print(f"sharded, queued x{ITERS}:       {queued:8.2f} ms", flush=True)

    # (c) queued with a shallow queue (2 in flight).
    t0 = time.perf_counter()
    for i in range(ITERS):
        state, metrics = step(state, *args)
        if i % 2 == 1:
            _ = np.asarray(jax.device_get(metrics.loss))
    _ = np.asarray(jax.device_get(metrics.loss))
    q2 = (time.perf_counter() - t0) / ITERS * 1000
    print(f"sharded, fence every 2:    {q2:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
