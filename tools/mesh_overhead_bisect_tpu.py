"""Bisect the bimodal sharded-step wall-clock on the tunneled TPU.

Observed: the SAME make_sharded_train_step graph runs at ~122 ms/step in
probe/trace-style harnesses and 0.4-9.8 s/step in bench/flip-style ones.
This runs one step object against each candidate difference IN ONE
PROCESS so the executable is shared and only the inputs vary:
  A probe-style state (random_scene arrays passed straight in)
  B fresh()-style state (jnp.copy of every leaf)
  C B + a CameraBank resident in HBM (bench/flip keep one alive)
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
from gsjax.scene import CameraBank
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.optimizer import adam_init
from gsjax.train.step import TrainState

W, H = 1920, 1080
N = 500_000
ITERS = 6


def main() -> None:
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

    def run_case(name, state, keepalive=None):
        state, metrics = step(state, *args)
        _ = np.asarray(jax.device_get(metrics.loss))
        t0 = time.perf_counter()
        for _ in range(ITERS):
            state, metrics = step(state, *args)
        _ = np.asarray(jax.device_get(metrics.loss))
        ms = (time.perf_counter() - t0) / ITERS * 1000
        print(f"{name}: {ms:8.2f} ms", flush=True)
        del keepalive
        return state

    # A: probe-style (fresh random_scene arrays straight in).
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    state_a = TrainState(
        params=params, opt=adam_init(params), aux=aux,
        step=jnp.zeros((), jnp.int32),
    )
    run_case("A straight-in          ", state_a)

    # B: fresh()-style copies.
    params2, aux2 = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    p = jax.tree.map(jnp.copy, params2)
    state_b = TrainState(
        params=p, opt=adam_init(p),
        aux=jax.tree.map(jnp.copy, aux2), step=jnp.zeros((), jnp.int32),
    )
    run_case("B copied leaves        ", state_b)

    # C: copies + resident CameraBank (uint8 GT bank like bench/flip).
    bank = CameraBank(
        views=camera.view[None], full_projs=camera.full_proj[None],
        centers=camera.cam_center[None], tan_fovx=camera.tan_fovx[None],
        tan_fovy=camera.tan_fovy[None],
        gt_rgb=jnp.zeros((1, 3, H, W), jnp.uint8),
        alpha=jnp.full((1, 1, H, W), 255, jnp.uint8), width=W, height=H,
    )
    params3, aux3 = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    p3 = jax.tree.map(jnp.copy, params3)
    state_c = TrainState(
        params=p3, opt=adam_init(p3),
        aux=jax.tree.map(jnp.copy, aux3), step=jnp.zeros((), jnp.int32),
    )
    run_case("C copies + bank        ", state_c, keepalive=bank)


if __name__ == "__main__":
    main()
