"""Device-time evidence for the binning stage: trace N jitted bin_gaussians
dispatches with jax.profiler and report BOTH the per-op device sums and the
device MAKESPAN per iteration.

Why this exists: wall-clock fences that fetch one element of a LARGE
alternate-memory-resident output (e.g. sorted_owner) pay a ~14 ms D2H
staging copy on the tunneled platform, which inflated profile_stages'
binning row ~2x through r4/r5 (reported 30 ms vs 15.1 ms true makespan).
All outputs of one XLA program complete together, so fencing on the scalar
num_instances measures the same completion without the staging penalty.
Usage: python tools/trace_binning.py [ctx]   (ctx = warm a full train-step
first and hold its outputs, to rule out context effects — measured
identical).
"""

import collections
import glob
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()

from gsjax.config import RasterConfig
from gsjax.render.api import render
from gsjax.render.binning import bin_gaussians
from gsjax.render.preprocess import preprocess
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.loss import l1_loss

WIDTH, HEIGHT, N = 1920, 1080, 500_000
ITERS = 8


def main() -> None:
    warm_ctx = len(sys.argv) > 1 and sys.argv[1] == "ctx"
    params, aux = random_scene(N, capacity=N, sh_degree=3, seed=0,
                               spread=2.5, scale_range=(0.004, 0.03))
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    cfg = RasterConfig(tile_w=32, tile_h=32, max_instances=1_179_648,
                       max_rows=524_288)
    offset = jnp.zeros((N, 2), jnp.float32)
    keep = []
    if warm_ctx:
        bg = jnp.zeros(3, jnp.float32)
        gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)

        def loss_fn(p, off):
            out = render(p, camera, active_sh_degree=3, bg_color=bg,
                         cfg=cfg, alive=aux.alive, mean2d_offset=off)
            return l1_loss(out.image, gt)

        step = jax.jit(
            lambda p, off: jax.value_and_grad(loss_fn, argnums=(0, 1))(p, off))
        o = step(params, offset)
        _ = np.asarray(jax.device_get(o[0].ravel()[:1]))
        keep.append(o)

    pre = jax.jit(lambda p, off: preprocess(
        xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
        scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
        active_sh_degree=3, mean2d_offset=off, alive=aux.alive))
    proj = pre(params, offset)
    binf = jax.jit(lambda mp, d, e, c, q: bin_gaussians(
        mp, d, e, c, q, HEIGHT, WIDTH, cfg))
    args = (proj.mean_pix, proj.depth, proj.ext, proj.conic, proj.qmax)
    out = binf(*args)
    _ = np.asarray(jax.device_get(out.num_instances.ravel()[:1]))

    trace_dir = "/tmp/gsjax_bin_trace"
    with jax.profiler.trace(trace_dir):
        for _ in range(ITERS):
            out = binf(*args)
        _ = np.asarray(jax.device_get(out.num_instances.ravel()[:1]))

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(trace_dir + "/**/*.xplane.pb", recursive=True))
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        agg = collections.Counter()
        total = lo = hi = None
        total = 0
        for line in plane.lines:
            for ev in line.events:
                s = line.timestamp_ns * 1000 + ev.offset_ps
                e = s + ev.duration_ps
                lo = s if lo is None or s < lo else lo
                hi = e if hi is None or e > hi else hi
            if "XLA Op" not in line.name and "Ops" not in line.name:
                continue
            for ev in line.events:
                agg[plane.event_metadata[ev.metadata_id].name] += ev.duration_ps
                total += ev.duration_ps
        print(f"{plane.name}: op-sum {total / 1e12 * 1000 / ITERS:.2f} ms/iter "
              f"(async windows overlap), MAKESPAN "
              f"{(hi - lo) / 1e9 / ITERS:.2f} ms/iter", flush=True)
        for name, ps in agg.most_common(10):
            print(f"  {ps / 1e12 * 1000 / ITERS:8.3f} ms  {name[:90]}")


if __name__ == "__main__":
    main()
