"""Compare compiled-HLO op histograms: sharded_grads vs full sharded step
(CPU). If the full step duplicates the render/backward, while/sort/fusion
counts double."""

from __future__ import annotations

import collections
import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.parallel.mesh import make_mesh
from gsjax.parallel.step import make_sharded_train_step
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.optimizer import adam_init
from gsjax.train.step import TrainState

W, H = 512, 256
N = 20_000


def histo(txt: str) -> collections.Counter:
    c = collections.Counter()
    for m in re.finditer(r"= \S+ (\w+)\(", txt):
        c[m.group(1)] += 1
    return c


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
    txt_g = (
        jax.jit(step.sharded_grads)
        .lower(params, aux.alive, *sargs)
        .compile()
        .as_text()
    )
    state = TrainState(
        params=params, opt=adam_init(params), aux=aux,
        step=jnp.zeros((), jnp.int32),
    )
    txt_s = jax.jit(step.one_step).lower(state, *sargs).compile().as_text()

    hg, hs = histo(txt_g), histo(txt_s)
    keys = sorted(set(hg) | set(hs), key=lambda k: -(hs.get(k, 0)))
    print(f"{'op':28s} {'grads':>7s} {'full':>7s}")
    for k in keys:
        a, b = hg.get(k, 0), hs.get(k, 0)
        if max(a, b) >= 3 or a != b:
            print(f"{k:28s} {a:7d} {b:7d}")


if __name__ == "__main__":
    main()
