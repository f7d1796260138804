"""Trace one bench train step with jax.profiler and dump the per-op
device-time breakdown from the xplane proto — finds the wall-clock that
stage-isolated timing misses (fusions, transposes, layout changes,
dispatch gaps).

--sharded traces make_sharded_train_step on a (data=1, tile=1) mesh
instead (the round-2 pathology: 24x slower than the plain step on real
TPU while virtual-CPU parity tests pass)."""

from __future__ import annotations

import collections
import glob
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()  # minutes-per-compile over the TPU tunnel
import numpy as np

from gsjax.config import RasterConfig
from gsjax.render.api import render
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.loss import l1_loss

WIDTH, HEIGHT = 1920, 1080
N = 500_000
TRACE_DIR = "/tmp/gsjax_trace"


def _sharded_step_fn(params, aux, camera, cfg):
    from gsjax.config import OptimizationConfig
    from gsjax.parallel.mesh import make_mesh
    from gsjax.parallel.step import make_sharded_train_step
    from gsjax.train.optimizer import adam_init
    from gsjax.train.step import TrainState

    mesh = make_mesh(jax.devices()[:1], data=1, tile=1)
    step = make_sharded_train_step(
        mesh, height=HEIGHT, width=WIDTH, active_sh_degree=3,
        opt_cfg=OptimizationConfig(), raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    args = (
        camera.view[None], camera.full_proj[None], camera.cam_center[None],
        camera.tan_fovx[None], camera.tan_fovy[None], gt[None], bg,
    )
    state = TrainState(
        params=params, opt=adam_init(params), aux=aux,
        step=jnp.zeros((), jnp.int32),
    )

    def run(state):
        new_state, metrics = step(state, *args)
        return metrics.loss, new_state

    return run, state


def main() -> None:
    sharded = "--sharded" in sys.argv
    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    cfg = RasterConfig(
        tile_w=32, tile_h=32, max_instances=1_179_648, max_rows=524_288,
    )
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

    def loss_fn(p, off):
        out = render(p, camera, active_sh_degree=3, bg_color=bg, cfg=cfg,
                     alive=aux.alive, mean2d_offset=off)
        return l1_loss(out.image, gt)

    @jax.jit
    def plain_step(p, off):
        loss, (gp, go) = jax.value_and_grad(loss_fn, (0, 1))(p, off)
        newp = jax.tree.map(lambda a, b: a - 0.0 * b, p, gp)
        return loss, newp

    if sharded:
        run, carry = _sharded_step_fn(params, aux, camera, cfg)
    else:
        offset = jnp.zeros((N, 2), jnp.float32)
        carry = params

        def run(p):
            loss, newp = plain_step(p, offset)
            return loss, newp

    import time

    for _ in range(3):
        loss, carry = run(carry)
    _ = np.asarray(jax.device_get(loss.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(4):
        loss, carry = run(carry)
    _ = np.asarray(jax.device_get(loss.ravel()[:1]))
    print(f"[{'sharded' if sharded else 'plain'}] "
          f"{(time.perf_counter() - t0) / 4 * 1000:.1f} ms/step", flush=True)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            loss, carry = run(carry)
        _ = np.asarray(jax.device_get(loss.ravel()[:1]))

    # Parse the xplane proto: aggregate device-plane op durations.
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(TRACE_DIR + "/**/*.xplane.pb", recursive=True))
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        print(f"=== plane: {plane.name}")
        agg = collections.Counter()
        total = 0
        for line in plane.lines:
            if "XLA Op" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                agg[meta.name] += ev.duration_ps
                total += ev.duration_ps
        print(f"  total op time: {total / 1e12 * 1000 / 4:.2f} ms/step over "
              f"{len(agg)} distinct ops")
        for name, ps in agg.most_common(45):
            print(f"  {ps / 1e12 * 1000 / 4:8.3f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
