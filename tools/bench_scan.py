"""Per-dispatch overhead probe: the bench fwd+bwd step dispatched one at a
time (bench.py's loop) vs scanned W steps per dispatch (how the trainer
actually drives the TPU). A large gap means the single-step bench
undercounts the achievable training throughput by the host/tunnel
dispatch overhead."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from gsjax.config import RasterConfig
from gsjax.render.api import render
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.loss import l1_loss

WIDTH, HEIGHT = 1920, 1080
N = 500_000
WINDOW = 10
OUTER = 3


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    cfg = RasterConfig(
        tile_w=32, tile_h=32, max_instances=1_179_648, max_rows=524_288,
        interpret=not on_tpu,
    )
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    def loss_fn(p, off):
        out = render(p, camera, active_sh_degree=3, bg_color=bg, cfg=cfg,
                     alive=aux.alive, mean2d_offset=off)
        return l1_loss(out.image, gt)

    def one(p, off):
        loss, (gp, _) = jax.value_and_grad(loss_fn, (0, 1))(p, off)
        newp = jax.tree.map(lambda a, b: a - 0.0 * b, p, gp)
        return newp, loss

    offset = jnp.zeros((N, 2), jnp.float32)

    @jax.jit
    def single(p):
        newp, loss = one(p, offset)
        return newp, loss

    @jax.jit
    def window(p):
        return lax.scan(lambda c, _: one(c, offset), p, None, length=WINDOW)

    p = params
    for _ in range(2):
        p, loss = single(p)
    _ = np.asarray(jax.device_get(loss.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(WINDOW * OUTER):
        p, loss = single(p)
    _ = np.asarray(jax.device_get(loss.ravel()[:1]))
    dt1 = (time.perf_counter() - t0) / (WINDOW * OUTER) * 1000
    print(f"single-step dispatch: {dt1:8.2f} ms/step", flush=True)

    p = params
    p, losses = window(p)
    _ = np.asarray(jax.device_get(losses.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(OUTER):
        p, losses = window(p)
    _ = np.asarray(jax.device_get(losses.ravel()[:1]))
    dtw = (time.perf_counter() - t0) / (WINDOW * OUTER) * 1000
    print(f"scanned x{WINDOW}:          {dtw:8.2f} ms/step "
          f"({WIDTH * HEIGHT / dtw * 1000 / 1e6:.1f} M px/s)", flush=True)


if __name__ == "__main__":
    main()
