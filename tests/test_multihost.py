"""Multi-process distributed training test (SURVEY.md §4(4), §5.8).

Launches 2 real OS processes, each owning 2 virtual CPU devices, joined
into one jax.distributed process group through
gsjax.parallel.multihost.maybe_init_distributed. Both run the sharded
train step over the global (data=2, tile=2) mesh — the per-Gaussian grad
psum over "tile" and the batch pmean over "data" cross the process
boundary — and the result must match a single-process run of the same
step on a local 4-device mesh.
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "multihost_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.fixture(scope="module")
def worker_results(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("multihost")
    port = _free_port()
    procs = []
    outs = []
    for pid in range(2):
        out = tmp / f"result_{pid}.json"
        outs.append(out)
        env = dict(os.environ)
        env.update(
            COORDINATOR_ADDRESS=f"localhost:{port}",
            NUM_PROCESSES="2",
            PROCESS_ID=str(pid),
            JAX_PLATFORMS="cpu",
        )
        # Drop any inherited single-process device-count flag; the worker
        # pins its own 2-device setting.
        env.pop("XLA_FLAGS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, WORKER, str(out)],
                env=env,
                cwd=REPO,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = [p.communicate(timeout=1200)[0].decode() for p in procs]
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    return [json.loads(out.read_text()) for out in outs]


class TestMultiProcess:
    def test_process_group_topology(self, worker_results):
        for r in worker_results:
            assert r["process_count"] == 2
            assert r["global_devices"] == 4
            assert r["local_devices"] == 2
        assert {r["process_index"] for r in worker_results} == {0, 1}
        # Round-robin host-local camera sharding.
        assert worker_results[0]["host_views"] == [0, 2, 4]
        assert worker_results[1]["host_views"] == [1, 3]

    def test_losses_agree_across_processes(self, worker_results):
        a, b = worker_results
        np.testing.assert_allclose(a["losses"], b["losses"], rtol=1e-6)
        assert a["losses"][1] < a["losses"][0]  # optimizer actually moved

    def test_scanned_window_matches_sequential(self, worker_results):
        """ONE make_sharded_train_steps dispatch (W=2 scan) across the
        process boundary reproduces the two sequential sharded steps."""
        a, b = worker_results
        np.testing.assert_allclose(a["window_losses"], b["window_losses"],
                                   rtol=1e-6)
        np.testing.assert_allclose(a["window_losses"], a["losses"], rtol=1e-5)

    def test_matches_single_process(self, worker_results):
        """The distributed (2 proc x 2 dev) step == single-process 4-dev
        step: same mesh shape, same scene, same camera."""
        import jax
        import jax.numpy as jnp

        from gsjax.config import OptimizationConfig, RasterConfig
        from gsjax.parallel import make_mesh
        from gsjax.parallel.step import make_sharded_train_step
        from gsjax.synthetic import look_at_origin_camera, random_scene
        from gsjax.train.optimizer import adam_init
        from gsjax.train.step import TrainState

        H = W = 48
        params, aux = random_scene(200, capacity=256, sh_degree=1, seed=3)
        camera = look_at_origin_camera(width=W, height=H)
        state = TrainState(
            params=params, opt=adam_init(params), aux=aux,
            step=jnp.zeros((), jnp.int32),
        )
        mesh = make_mesh(jax.devices()[:4], data=2, tile=2)
        step = make_sharded_train_step(
            mesh, height=H, width=W, active_sh_degree=1,
            opt_cfg=OptimizationConfig(),
            raster_cfg=RasterConfig(max_instances=8192, interpret=True),
            spatial_lr_scale=1.0,
        )
        gt = np.tile(
            np.linspace(0, 1, H * W, dtype=np.float32).reshape(1, H, W),
            (3, 1, 1),
        )
        data = 2
        args = (
            np.broadcast_to(np.asarray(camera.view), (data, 4, 4)),
            np.broadcast_to(np.asarray(camera.full_proj), (data, 4, 4)),
            np.broadcast_to(np.asarray(camera.cam_center), (data, 3)),
            np.broadcast_to(np.float32(camera.tan_fovx), (data,)),
            np.broadcast_to(np.float32(camera.tan_fovy), (data,)),
            np.broadcast_to(gt, (data,) + gt.shape),
            np.zeros(3, np.float32),
        )
        losses = []
        for _ in range(2):
            state, metrics = step(state, *args)
            losses.append(float(metrics.loss))
        np.testing.assert_allclose(
            losses, worker_results[0]["losses"], rtol=1e-5
        )
