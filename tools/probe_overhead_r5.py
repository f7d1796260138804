"""Tunnel/dispatch overhead probe (round 5).

The r4 quality run averaged ~0.84 s/iteration while bench.py's chained
steps cost ~0.1 s — something around the dispatches, syncs, or transfers
eats the difference. This measures the tunnel's primitives in isolation:

  1. sync RTT: dispatch a trivial op and block, in a loop.
  2. H2D / D2H bandwidth on a 64 MB buffer (checkpoint writes fetch ~0.5 GB
     of state at 2M capacity).
  3. a donated scanned train window at quality-run scale (400px), synced
     per window like the trainer, vs chained without syncs — the delta is
     the real per-window overhead the trainer pays.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()


def main() -> None:
    # 1. sync round trip
    tiny = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    x = tiny(x)
    _ = np.asarray(x[0, 0])
    t0 = time.perf_counter()
    for _ in range(10):
        x = tiny(x)
        _ = np.asarray(x[0, 0])
    rtt = (time.perf_counter() - t0) / 10
    print(f"sync RTT (tiny op + scalar fetch): {rtt * 1000:.1f} ms", flush=True)

    # 2. transfer bandwidth
    big = np.zeros((16 * 1024 * 1024,), np.float32)  # 64 MB
    t0 = time.perf_counter()
    d = jax.device_put(big)
    d.block_until_ready()
    h2d = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(d)
    d2h = time.perf_counter() - t0
    print(f"H2D 64MB: {h2d:.2f}s ({64 / h2d:.1f} MB/s)  "
          f"D2H 64MB: {d2h:.2f}s ({64 / d2h:.1f} MB/s)", flush=True)

    # 3. quality-scale train window, synced vs chained
    from gsjax.config import OptimizationConfig, RasterConfig
    from gsjax.core.cameras import Camera
    from gsjax.scene import CameraBank
    from gsjax.synthetic import look_at_origin_camera, random_scene
    from gsjax.train.optimizer import adam_init
    from gsjax.train.step import TrainState, train_steps

    n, cap = 900_000, 1 << 20
    params, aux = random_scene(
        n, capacity=cap, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    res = 400
    cams = [look_at_origin_camera(width=res, height=res) for _ in range(8)]
    rgbs = [np.zeros((3, res, res), np.uint8) for _ in cams]
    alphas = [np.full((1, res, res), 255, np.uint8) for _ in cams]
    bank = CameraBank.from_cameras(cams, rgbs, alphas)
    state = TrainState(params=params, opt=adam_init(params), aux=aux,
                       step=jnp.zeros((), jnp.int32))
    opt_cfg = OptimizationConfig()
    # quality-v2 final budget scale
    raster_cfg = RasterConfig(tile_w=32, tile_h=32,
                              max_instances=1 << 21, max_rows=1 << 20,
                              interpret=jax.default_backend() != "tpu")
    W = 16
    idxs = jnp.zeros((W,), jnp.int32)
    bgs = jnp.zeros((W, 3), jnp.float32)

    def window(st):
        return train_steps(
            st, bank, idxs, bgs, active_sh_degree=3, opt_cfg=opt_cfg,
            raster_cfg=raster_cfg, spatial_lr_scale=1.0,
        )

    state, m = window(state)  # compile
    _ = np.asarray(m.loss)
    # synced per window (trainer pattern)
    t0 = time.perf_counter()
    for _ in range(4):
        state, m = window(state)
        _ = jax.tree.map(np.asarray, m)
    synced = (time.perf_counter() - t0) / 4
    # chained, one sync at the end
    t0 = time.perf_counter()
    for _ in range(4):
        state, m = window(state)
    _ = np.asarray(m.loss)
    chained = (time.perf_counter() - t0) / 4
    print(f"train window W={W} @400px cap={cap} budgets 2M/1M:", flush=True)
    print(f"  synced per window : {synced:.2f}s ({synced / W * 1000:.0f} ms/it)",
          flush=True)
    print(f"  chained           : {chained:.2f}s ({chained / W * 1000:.0f} ms/it)",
          flush=True)
    print(f"  per-window sync overhead: {(synced - chained) * 1000:.0f} ms",
          flush=True)


if __name__ == "__main__":
    main()
