"""CPU-side structural comparison of plain vs (1,1)-mesh sharded train step.

The r2 real-TPU measurement saw the sharded step 24x slower than the plain
step; virtual-CPU parity tests never timed it. This times both on the CPU
backend at a small size (interpret-mode Pallas dominates both equally), so
a large ratio here indicates a *structural* difference (duplicated work,
extra copies, retrace per call) rather than a Mosaic/layout TPU issue.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

import functools

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.parallel.mesh import make_mesh
from gsjax.parallel.step import make_sharded_train_step
from gsjax.scene import CameraBank
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.optimizer import adam_init
from gsjax.train.step import TrainState, train_step

W, H = 512, 256
N = 20_000
ITERS = 8


def fence(tree):
    _ = np.asarray(jax.device_get(jax.tree.leaves(tree)[0].ravel()[:1]))


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
    def fresh_state():
        # train_step donates its state; each timed path needs its own copy.
        p = jax.tree.map(lambda x: jnp.array(x), params)
        a = jax.tree.map(lambda x: jnp.array(x), aux)
        return TrainState(
            params=p, opt=adam_init(p), aux=a, step=jnp.zeros((), jnp.int32)
        )

    state = fresh_state()

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
    plain = functools.partial(
        train_step, active_sh_degree=2, opt_cfg=opt_cfg, raster_cfg=cfg,
        spatial_lr_scale=1.0,
    )

    def run(stepfn, s, args, label):
        s2 = stepfn(s, *args)[0]
        fence(s2.params)
        t0 = time.perf_counter()
        cur = s2
        for _ in range(ITERS):
            cur = stepfn(cur, *args)[0]
        fence(cur.params)
        dt = (time.perf_counter() - t0) / ITERS
        print(f"{label}: {dt * 1e3:.1f} ms/step", flush=True)
        return dt

    t_plain = run(plain, state, (bank, jnp.zeros((), jnp.int32), bg), "plain")

    mesh = make_mesh(devices=jax.devices()[:1], data=1, tile=1)
    sharded = make_sharded_train_step(
        mesh, height=H, width=W, active_sh_degree=2, opt_cfg=opt_cfg,
        raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    sargs = (
        camera.view[None], camera.full_proj[None], camera.cam_center[None],
        camera.tan_fovx[None], camera.tan_fovy[None], gt[None], bg,
    )
    state2 = fresh_state()
    t_sh = run(sharded, state2, sargs, "sharded(1,1)")
    print(f"ratio sharded/plain = {t_sh / t_plain:.2f}x", flush=True)


if __name__ == "__main__":
    main()
