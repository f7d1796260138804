"""Trace plain vs (1,1)-sharded fwd+bwd on CPU and diff the per-op time
breakdown (the sharded backward is structurally ~2-3x slower even on CPU;
find which ops grew)."""

from __future__ import annotations

import collections
import glob
import shutil
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.parallel.mesh import make_mesh
from gsjax.parallel.step import make_sharded_train_step
from gsjax.render.api import render
from gsjax.scene import CameraBank
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.loss import l1_loss, ssim
from gsjax.train.optimizer import adam_init
from gsjax.train.step import TrainState, train_step

W, H = 512, 256
N = 20_000


def dump_trace(tag: str, fn, fence_out):
    tdir = f"/tmp/gsjax_cpu_trace_{tag}"
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        out = fn()
        _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(tdir + "/**/*.xplane.pb", recursive=True))
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    agg = collections.Counter()
    total = 0
    for plane in space.planes:
        for line in plane.lines:
            for ev in line.events:
                meta = plane.event_metadata[ev.metadata_id]
                nm = meta.name
                if not nm or nm.startswith("Thread") or "/" in nm[:1]:
                    continue
                agg[nm] += ev.duration_ps
                total += ev.duration_ps
    print(f"=== {tag}: total tracked {total / 1e12 * 1000:.0f} ms")
    for name, ps in agg.most_common(30):
        print(f"  {ps / 1e12 * 1000:8.1f} ms  {name[:120]}")
    return agg


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
    alive = aux.alive
    lam = opt_cfg.lambda_dssim

    def plain_loss(p, offset):
        out = render(
            p, camera, active_sh_degree=2, bg_color=bg, cfg=cfg,
            alive=alive, mean2d_offset=offset,
        )
        l1 = l1_loss(out.image, gt)
        return (1.0 - lam) * l1 + lam * (1.0 - ssim(out.image, gt))

    offset = jnp.zeros((params.capacity, 2), jnp.float32)
    g_plain = jax.jit(jax.grad(plain_loss, argnums=(0, 1)))
    g = g_plain(params, offset)  # compile
    _ = np.asarray(jax.device_get(g[1].ravel()[:1]))
    a_plain = dump_trace("plain", lambda: g_plain(params, offset), None)

    mesh = make_mesh(devices=jax.devices()[:1], data=1, tile=1)
    step = make_sharded_train_step(
        mesh, height=H, width=W, active_sh_degree=2, opt_cfg=opt_cfg,
        raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    grads_fn = step.sharded_grads
    sargs = (
        params, alive, camera.view[None], camera.full_proj[None],
        camera.cam_center[None], camera.tan_fovx[None],
        camera.tan_fovy[None], gt[None], bg,
    )
    jitted = jax.jit(grads_fn)
    out = jitted(*sargs)
    _ = np.asarray(jax.device_get(jax.tree.leaves(out)[0].ravel()[:1]))
    a_sh = dump_trace("sharded", lambda: jitted(*sargs), None)

    print("\n=== biggest sharded-minus-plain deltas")
    keys = set(a_plain) | set(a_sh)
    deltas = sorted(
        ((a_sh.get(k, 0) - a_plain.get(k, 0), k) for k in keys), reverse=True
    )
    for d, k in deltas[:25]:
        print(f"  {d / 1e12 * 1000:+9.1f} ms  {k[:120]}")


if __name__ == "__main__":
    main()
