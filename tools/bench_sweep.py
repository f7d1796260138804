"""Raster-config sweep on the headline bench scene: tile shape x chunk x
strips, fwd+bwd train step and forward-only render, one process.

Decides the round-4 perf attack empirically (VERDICT r3 #1): every
instance-rate stage scales with the pair count (tile shape) while the
kernels' per-chunk fixed cost scales with chunk count and tile area — the
crossover must be measured on the real chip, per scene class.

Usage: python tools/bench_sweep.py [--iters 12] [--out sweep.json]
       [--configs 32x32c128s1,64x32c128s1,...] [--fwd_only]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()
import numpy as np

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.render.api import render
from gsjax.scene import CameraBank
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.optimizer import adam_init
from gsjax.train.step import TrainState, train_step

W, H = 1920, 1080
N = 500_000

DEFAULT_CONFIGS = (
    "32x32c128s1",
    "64x32c128s1",
    "32x32c256s1",
    "64x32c256s1",
    "32x32c128s2",
    "64x64c128s1",
)


def fence(x):
    _ = np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def parse_cfg(s: str) -> RasterConfig:
    m = re.fullmatch(r"(\d+)x(\d+)c(\d+)s(\d+)(f?)", s)
    if not m:
        raise ValueError(f"bad config {s!r} (want e.g. 32x32c128s1)")
    tw, th, chunk, strips = map(int, m.groups()[:4])
    # Budgets: snug-ish for the 500k bench scene at each tile shape, chunk
    # aligned. Bigger tiles -> fewer pairs; keep one budget (work scales
    # with budget) so shapes compare on even footing per shape class.
    inst = {16: 1 << 21, 32: 1179648, 64: 1 << 20}.get(tw, 1 << 21)
    inst = -(-inst // chunk) * chunk
    rows = -(-(1 << 19) // chunk) * chunk
    return RasterConfig(
        tile_w=tw, tile_h=th, chunk=chunk, strips=strips,
        max_instances=inst, max_rows=rows,
        interpret=jax.default_backend() != "tpu",
        fast_fwd=bool(m.group(5)),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--configs", default=",".join(DEFAULT_CONFIGS))
    ap.add_argument("--out", default=None)
    ap.add_argument("--fwd_only", action="store_true",
                    help="also time forward-only renders per config")
    args = ap.parse_args()

    params, aux = random_scene(
        N, capacity=N, sh_degree=3, seed=0, spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=W, height=H)
    opt_cfg = OptimizationConfig()
    bg = jnp.zeros(3, jnp.float32)
    bank = CameraBank(
        views=camera.view[None],
        full_projs=camera.full_proj[None],
        centers=camera.cam_center[None],
        tan_fovx=camera.tan_fovx[None],
        tan_fovy=camera.tan_fovy[None],
        gt_rgb=jnp.zeros((1, 3, H, W), jnp.uint8),
        alpha=jnp.full((1, 1, H, W), 255, jnp.uint8),
        width=W,
        height=H,
    )

    results = []
    for name in args.configs.split(","):
        try:
            _sweep_one(name, args, params, aux, camera, bank, opt_cfg, bg,
                       results)
        except Exception as e:  # noqa: BLE001 — a config that fails to
            # compile (e.g. 64x32 bwd exceeding scoped VMEM) must not kill
            # the remaining configs' measurements.
            entry = {"config": name, "error": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps(entry), flush=True)
            results.append(entry)

    payload = {"backend": jax.default_backend(), "n": N, "results": results}
    if args.out:
        with open(args.out, "w") as f:
            json.dump(payload, f, indent=1)


def _sweep_one(name, args, params, aux, camera, bank, opt_cfg, bg, results):
    if True:
        cfg = parse_cfg(name)
        entry = {"config": name, "max_instances": cfg.max_instances}

        if not cfg.fast_fwd:
            def fresh():
                p = jax.tree.map(jnp.copy, params)
                return TrainState(
                    params=p, opt=adam_init(p),
                    aux=jax.tree.map(jnp.copy, aux),
                    step=jnp.zeros((), jnp.int32),
                )

            def run_once(state, cfg=cfg):
                state, m = train_step(
                    state, bank, jnp.int32(0), bg, active_sh_degree=3,
                    opt_cfg=opt_cfg, raster_cfg=cfg, spatial_lr_scale=1.0,
                )
                return state, m

            state, m = run_once(fresh())
            fence(state.params.xyz)
            ninst = int(np.asarray(m.num_instances))
            entry["pairs"] = ninst
            if ninst > cfg.max_instances:
                entry["overflow"] = True
            best = float("inf")
            streak = 0
            for i in range(30):
                t0 = time.perf_counter()
                state, _ = run_once(state)
                fence(state.params.xyz)
                dt = time.perf_counter() - t0
                streak = streak + 1 if dt < 1.5 * best else 0
                best = min(best, dt)
                if streak >= 3 and i >= 4:
                    break
            t0 = time.perf_counter()
            for _ in range(args.iters):
                state, _ = run_once(state)
            fence(state.params.xyz)
            ms = (time.perf_counter() - t0) / args.iters * 1000
            entry["fwd_bwd_ms"] = round(ms, 2)
            entry["px_per_s"] = round(W * H / (ms / 1000))
            del state

        if args.fwd_only or cfg.fast_fwd:
            rfn = jax.jit(lambda p, a, cfg=cfg: render(
                p, camera, active_sh_degree=3, bg_color=bg, cfg=cfg, alive=a,
            ).image)
            img = rfn(params, aux.alive)
            img.block_until_ready()
            best = float("inf")
            streak = 0
            prev = img
            for i in range(30):
                t0 = time.perf_counter()
                prev = rfn(params, aux.alive)
                prev.block_until_ready()
                dt = time.perf_counter() - t0
                streak = streak + 1 if dt < 1.5 * best else 0
                best = min(best, dt)
                if streak >= 3 and i >= 4:
                    break
            t0 = time.perf_counter()
            for _ in range(args.iters):
                prev = rfn(params, aux.alive)
            prev.block_until_ready()
            ms = (time.perf_counter() - t0) / args.iters * 1000
            entry["fwd_ms"] = round(ms, 2)
            entry["fps"] = round(1000.0 / ms, 1)

        print(json.dumps(entry), flush=True)
        results.append(entry)


if __name__ == "__main__":
    main()
