"""Tile-parallel scaling-efficiency harness (BASELINE north star: >=85%
pixels/s scaling efficiency at 2 hosts).

Measures the sharded train step's wall-clock across mesh shapes
(data=1, tile=n) and reports pixels/s plus efficiency vs the 1-device mesh:
  eff(n) = t(1) / (n * t(n)).

On this single-chip environment the harness runs on N virtual CPU devices
(functional check of the collective schedule, not TPU-meaningful numbers);
on real multi-chip hardware the same script measures true ICI scaling.

Usage:
  python tools/bench_scaling.py [--tiles 1,2,4,8] [--width 640]
      [--height 360] [--n 50000] [--iters 5] [--virtual 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiles", default="1,2,4,8")
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--n", type=int, default=50_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--virtual", type=int, default=0,
        help="force N virtual CPU devices (0 = use real devices)",
    )
    ap.add_argument(
        "--out", default=None,
        help="also write the JSON payload to this file",
    )
    args = ap.parse_args()

    if args.virtual:
        os.environ["JAX_PLATFORMS"] = "cpu"
        flags = os.environ.get("XLA_FLAGS", "")
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.virtual:
        jax.config.update("jax_platforms", "cpu")

    from gsjax.config import OptimizationConfig, RasterConfig
    from gsjax.parallel.mesh import make_mesh
    from gsjax.parallel.step import make_sharded_train_step
    from gsjax.synthetic import look_at_origin_camera, random_scene
    from gsjax.train.optimizer import adam_init
    from gsjax.train.step import TrainState

    W, H = args.width, args.height
    on_tpu = jax.default_backend() == "tpu"
    params, aux = random_scene(
        args.n, capacity=args.n, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=W, height=H)
    cfg = RasterConfig(
        tile_w=32, tile_h=32, interpret=not on_tpu,
    )
    opt_cfg = OptimizationConfig()
    gt = jnp.zeros((3, H, W), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    step_args = (
        camera.view[None], camera.full_proj[None], camera.cam_center[None],
        camera.tan_fovx[None], camera.tan_fovy[None], gt[None], bg,
    )

    def fresh():
        p = jax.tree.map(jnp.copy, params)
        return TrainState(
            params=p, opt=adam_init(p),
            aux=jax.tree.map(jnp.copy, aux),
            step=jnp.zeros((), jnp.int32),
        )

    def fence(x):
        _ = np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))

    devices = jax.devices()
    results = []
    for n_tile in (int(t) for t in args.tiles.split(",")):
        if n_tile > len(devices):
            print(f"# skipping tile={n_tile}: only {len(devices)} devices")
            continue
        mesh = make_mesh(devices[:n_tile], data=1, tile=n_tile)
        step = make_sharded_train_step(
            mesh, height=H, width=W, active_sh_degree=3,
            opt_cfg=opt_cfg, raster_cfg=cfg, spatial_lr_scale=1.0,
        )
        state = fresh()
        state, _ = step(state, *step_args)
        fence(state.params.xyz)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state, _ = step(state, *step_args)
        fence(state.params.xyz)
        ms = (time.perf_counter() - t0) / args.iters * 1000
        results.append({"tile": n_tile, "ms_per_step": round(ms, 2)})
        print(f"tile={n_tile}: {ms:8.2f} ms/step", flush=True)

    if results:
        t1 = results[0]["ms_per_step"]
        for r in results:
            r["pixels_per_s"] = round(W * H / (r["ms_per_step"] / 1000), 1)
            r["efficiency_vs_1dev"] = round(
                t1 / (r["tile"] * r["ms_per_step"]), 4
            )
        payload = {
            "backend": jax.default_backend(),
            "virtual_devices": args.virtual or None,
            "width": W, "height": H, "n_gaussians": args.n,
            "results": results,
        }
        if args.virtual or jax.default_backend() == "cpu":
            # N virtual devices time-slice ONE CPU: these numbers validate
            # that the sharded schedule runs, and nothing else. For a
            # defensible multi-chip figure see tools/scaling_projection.py.
            payload["evidence"] = (
                "NONE — virtual devices share one processor; "
                "functional-schedule check only, not a scaling measurement"
            )
            for r in results:
                r.pop("efficiency_vs_1dev", None)
        print(json.dumps(payload))
        if args.out:
            with open(args.out, "w") as f:
                json.dump(payload, f, indent=1)


if __name__ == "__main__":
    main()
