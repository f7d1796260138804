"""Forward-only (viewer-path) rendering throughput at 1080p.

Times jit(render) — the exact graph the SIBR network viewer and eval
rendering drive (no gradients, no custom_vjp residual retention under
plain jit) — on the bench scene, and at a half-resolution interactive
setting. Prints fps per configuration.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.config import RasterConfig
from gsjax.render.api import render
from gsjax.synthetic import look_at_origin_camera, random_scene

N = 500_000
ITERS = 40


def main() -> None:
    on_tpu = jax.default_backend() == "tpu"
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    for width, height, maxi, maxr in (
        (1920, 1080, 1_179_648, 524_288),
        (960, 540, 524_288, 262_144),
    ):
        for fast in (False, True):
            camera = look_at_origin_camera(width=width, height=height)
            cfg = RasterConfig(
                tile_w=32, tile_h=32, max_instances=maxi, max_rows=maxr,
                interpret=not on_tpu, fast_fwd=fast,
            )
            bg = jnp.zeros(3, jnp.float32)

            fwd = jax.jit(
                lambda p, a: render(
                    p, camera, active_sh_degree=3, bg_color=bg, cfg=cfg,
                    alive=a
                ).image
            )
            img = fwd(params, aux.alive)
            _ = np.asarray(jax.device_get(img.ravel()[:1]))
            n_inst = int(render(
                params, camera, active_sh_degree=3, bg_color=bg, cfg=cfg,
                alive=aux.alive).num_instances)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                img = fwd(params, aux.alive)
            _ = np.asarray(jax.device_get(img.ravel()[:1]))
            dt = (time.perf_counter() - t0) / ITERS
            print(
                f"{width}x{height}{' fast_fwd' if fast else '         '}: "
                f"{1.0 / dt:6.1f} fps ({dt * 1000:.1f} ms; {n_inst} pairs)",
                flush=True,
            )


if __name__ == "__main__":
    main()
