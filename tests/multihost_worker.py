"""Worker process for the multi-process jax.distributed test.

Launched by tests/test_multihost.py with COORDINATOR_ADDRESS /
NUM_PROCESSES / PROCESS_ID in the environment and 2 virtual CPU devices
per process. Initializes the process group through
gsjax.parallel.multihost.maybe_init_distributed (the code under test),
builds the global ("data", "tile") mesh spanning BOTH processes' devices,
runs two sharded train steps on a deterministic tiny scene (the "tile"
psum and "data" pmean cross the process boundary), and writes its loss +
topology facts to the JSON path in argv[1].
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.parallel import make_mesh
from gsjax.parallel.multihost import host_local_views, maybe_init_distributed
from gsjax.parallel.step import make_sharded_train_step
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.optimizer import adam_init
from gsjax.train.step import TrainState

H = W = 48
SH_DEG = 1


def main() -> None:
    out_path = sys.argv[1]
    active = maybe_init_distributed()
    assert active, "maybe_init_distributed must trigger under the env protocol"

    params, aux = random_scene(200, capacity=256, sh_degree=SH_DEG, seed=3)
    camera = look_at_origin_camera(width=W, height=H)
    cfg = RasterConfig(max_instances=8192, interpret=True)
    opt_cfg = OptimizationConfig()
    data, tile = 2, 2
    mesh = make_mesh(jax.devices(), data=data, tile=tile)

    state = TrainState(
        params=params,
        opt=adam_init(params),
        aux=aux,
        step=jnp.zeros((), jnp.int32),
    )
    step = make_sharded_train_step(
        mesh, height=H, width=W, active_sh_degree=SH_DEG,
        opt_cfg=opt_cfg, raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    gt = np.tile(
        np.linspace(0, 1, H * W, dtype=np.float32).reshape(1, H, W), (3, 1, 1)
    )
    views = np.broadcast_to(np.asarray(camera.view), (data, 4, 4))
    projs = np.broadcast_to(np.asarray(camera.full_proj), (data, 4, 4))
    centers = np.broadcast_to(np.asarray(camera.cam_center), (data, 3))
    tanx = np.broadcast_to(np.float32(camera.tan_fovx), (data,))
    tany = np.broadcast_to(np.float32(camera.tan_fovy), (data,))
    gts = np.broadcast_to(gt, (data,) + gt.shape)
    bg = np.zeros(3, np.float32)

    losses = []
    for _ in range(2):
        state, metrics = step(
            state, views, projs, centers, tanx, tany, gts, bg
        )
        losses.append(float(metrics.loss))

    # Scanned-window path across the process boundary (VERDICT r4 #4): the
    # SAME two updates driven by ONE make_sharded_train_steps dispatch from
    # a fresh identical state must reproduce the sequential losses — the
    # scan's collectives (tile psum / data pmean / halo ppermute) all cross
    # processes W times inside one executable.
    from gsjax.parallel.step import make_sharded_train_steps

    params2, aux2 = random_scene(200, capacity=256, sh_degree=SH_DEG, seed=3)
    state2 = TrainState(
        params=params2, opt=adam_init(params2), aux=aux2,
        step=jnp.zeros((), jnp.int32),
    )
    steps = make_sharded_train_steps(
        mesh, height=H, width=W, active_sh_degree=SH_DEG,
        opt_cfg=opt_cfg, raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    wlen = 2

    def wstack(x):
        return np.broadcast_to(x, (wlen,) + x.shape)

    state2, wmetrics = steps(
        state2, wstack(views), wstack(projs), wstack(centers), wstack(tanx),
        wstack(tany), wstack(gts), np.broadcast_to(bg, (wlen, 3)),
    )
    window_losses = [float(v) for v in np.asarray(wmetrics.loss)]

    result = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "global_devices": len(jax.devices()),
        "local_devices": len(jax.local_devices()),
        "losses": losses,
        "window_losses": window_losses,
        "host_views": list(host_local_views(5)),
    }
    with open(out_path, "w") as f:
        json.dump(result, f)


if __name__ == "__main__":
    main()
