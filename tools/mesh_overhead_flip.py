"""Order-flipped mesh-overhead bench: SHARDED phase first, then PLAIN.

bench_mesh_overhead.py (plain → sharded) measured sharded at 445 ms vs
plain 122; the sharded-only probe measures 122. If the slowdown follows
whichever phase runs SECOND, the 3.7x is in-process contamination (two
resident executables / allocator pressure on the tunneled chip), not a
property of the shard_map graph.
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
from gsjax.train.step import TrainState, train_step

W, H = 1920, 1080
N = 500_000
ITERS = 10


def fence(x):
    _ = np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def main() -> None:
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=W, height=H)
    cfg = RasterConfig(
        tile_w=32, tile_h=32, max_instances=1_179_648, max_rows=524_288,
    )
    opt_cfg = OptimizationConfig()
    gt = jnp.zeros((3, H, W), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    bank = CameraBank(
        views=camera.view[None],
        full_projs=camera.full_proj[None],
        centers=camera.cam_center[None],
        tan_fovx=camera.tan_fovx[None],
        tan_fovy=camera.tan_fovy[None],
        gt_rgb=jnp.zeros((1, 3, H, W), jnp.uint8),
        alpha=jnp.full((1, 1, H, W), 255, jnp.uint8),
        width=W,
        height=H,
    )

    def fresh():
        p = jax.tree.map(jnp.copy, params)
        return TrainState(
            params=p, opt=adam_init(p),
            aux=jax.tree.map(jnp.copy, aux),
            step=jnp.zeros((), jnp.int32),
        )

    # Sharded FIRST.
    mesh = make_mesh(jax.devices()[:1], data=1, tile=1)
    step = make_sharded_train_step(
        mesh, height=H, width=W, active_sh_degree=3,
        opt_cfg=opt_cfg, raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    args = (
        camera.view[None], camera.full_proj[None], camera.cam_center[None],
        camera.tan_fovx[None], camera.tan_fovy[None], gt[None], bg,
    )
    state = fresh()
    state, _ = step(state, *args)
    fence(state.params.xyz)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, _ = step(state, *args)
    fence(state.params.xyz)
    sharded = (time.perf_counter() - t0) / ITERS * 1000
    print(f"sharded step (first):      {sharded:8.2f} ms", flush=True)
    del state

    # Plain SECOND.
    state = fresh()
    state, _ = train_step(
        state, bank, jnp.int32(0), bg, active_sh_degree=3,
        opt_cfg=opt_cfg, raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    fence(state.params.xyz)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, _ = train_step(
            state, bank, jnp.int32(0), bg, active_sh_degree=3,
            opt_cfg=opt_cfg, raster_cfg=cfg, spatial_lr_scale=1.0,
        )
    fence(state.params.xyz)
    plain = (time.perf_counter() - t0) / ITERS * 1000
    print(f"plain step (second):       {plain:8.2f} ms "
          f"(sharded/plain = {sharded / plain:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
