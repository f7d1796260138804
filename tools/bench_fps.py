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

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()  # minutes-per-compile over the TPU tunnel
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
    # (width, height, tile_w, tile_h, max_instances, max_rows): bigger tiles
    # shrink the instance stream (binning/gather are the fwd-only
    # bottleneck) at the price of more pixel work per instance — sweep both
    # shapes at 1080p. Budgets sized from the 32x32 exact pair count (the
    # 64x32 stream is strictly smaller).
    for width, height, tw, th, maxi, maxr in (
        (1920, 1080, 32, 32, 1_179_648, 524_288),
        (1920, 1080, 64, 32, 1_179_648, 524_288),
        (960, 540, 32, 32, 524_288, 262_144),
    ):
        for fast in (False, True):
            camera = look_at_origin_camera(width=width, height=height)
            cfg = RasterConfig(
                tile_w=tw, tile_h=th, max_instances=maxi, max_rows=maxr,
                interpret=not on_tpu, fast_fwd=fast,
            )
            bg = jnp.zeros(3, jnp.float32)

            # Chain dispatches through a data dependency (image -> dummy
            # mean2d_offset): 40 independent same-input dispatches can
            # queue-thrash on the tunneled platform and read ~3x slow.
            zero_off = jnp.zeros((params.capacity, 2), jnp.float32)

            @jax.jit
            def fwd(p, a, off):
                img = render(
                    p, camera, active_sh_degree=3, bg_color=bg, cfg=cfg,
                    alive=a, mean2d_offset=off,
                ).image
                return img, zero_off + 0.0 * img[0, 0, 0]

            img, off = fwd(params, aux.alive, zero_off)
            _ = np.asarray(jax.device_get(img.ravel()[:1]))
            n_inst = int(render(
                params, camera, active_sh_degree=3, bg_color=bg, cfg=cfg,
                alive=aux.alive).num_instances)
            t0 = time.perf_counter()
            for _ in range(ITERS):
                img, off = fwd(params, aux.alive, off)
            _ = np.asarray(jax.device_get(img.ravel()[:1]))
            dt = (time.perf_counter() - t0) / ITERS
            print(
                f"{width}x{height} {tw}x{th}"
                f"{' fast_fwd' if fast else '         '}: "
                f"{1.0 / dt:6.1f} fps ({dt * 1000:.1f} ms; {n_inst} pairs)",
                flush=True,
            )


if __name__ == "__main__":
    main()
