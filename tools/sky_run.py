"""Skysphere end-to-end demonstration (VERDICT r4 #6): train the SAME
unbounded-style synthetic scene (ray-traced spheres over a checkerboard
with a sky-gradient background — tools/synthetic_scene.py colors ray
misses with an elevation gradient, so ~half the pixels are far field)
twice, with and without the sky shell (--sky_gaussians), and compare
held-out PSNR. Also verifies the shell SURVIVES densify/prune: the run
crosses the 3000-iteration opacity reset so the world-size prune
(max_screen_size=20) fires with the distance-scaled unbounded threshold
(gsjax/train/densify.py) — the flat reference threshold would delete the
whole shell there.

Writes artifacts/sky_run.json.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import re
import sys
import time

sys.path.insert(0, "/root/repo")


def run_one(scene_dir, model_dir, iterations, sky_n, budgets):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsjax.config import ModelConfig, OptimizationConfig, RasterConfig
    from gsjax.image_metrics import psnr as psnr_fn
    from gsjax.scene import Scene
    from gsjax.train.trainer import Trainer

    model_cfg = ModelConfig(
        source_path=scene_dir, model_path=model_dir, eval=True,
        sky_gaussians=sky_n,
    )
    opt_cfg = OptimizationConfig(iterations=iterations)
    os.makedirs(model_dir, exist_ok=True)
    scene = Scene(model_cfg, capacity=262_144)
    raster_cfg = RasterConfig(
        tile_w=32, tile_h=32,
        max_instances=budgets[0], max_rows=budgets[1],
    )
    trainer = Trainer(
        scene, model_cfg, opt_cfg, raster_cfg=raster_cfg,
        adapt_budgets=True,
    )
    ext = float(scene.cameras_extent)

    def shell_stats():
        alive = np.asarray(trainer.state.aux.alive)
        xyz = np.asarray(trainer.state.params.xyz)[alive]
        opac = np.asarray(
            trainer.state.params.get_opacity()
        ).reshape(-1)[alive]
        r = np.linalg.norm(
            xyz - np.asarray(scene.scene_center)[None, :], axis=-1
        )
        far = r > 5.0 * ext
        return {
            "n_alive": int(alive.sum()),
            "n_far_shell": int(far.sum()),
            "far_opacity_mean": round(float(opac[far].mean()), 4)
            if far.any() else None,
        }

    start_shell = shell_stats()

    captured = io.StringIO()

    class Tee(io.TextIOBase):
        def write(self, s):
            sys.__stdout__.write(s)
            sys.__stdout__.flush()
            captured.write(s)
            return len(s)

    old = sys.stdout
    sys.stdout = Tee()
    t0 = time.perf_counter()
    try:
        trainer.train(
            test_iterations=(500, 1000, 2000, 3000, iterations),
            save_iterations=(iterations,),
            checkpoint_iterations=(),
        )
    finally:
        sys.stdout = old
    wall = time.perf_counter() - t0

    evals = [
        {"iteration": int(m.group(1)), "split": m.group(2),
         "psnr": float(m.group(4)), "l1": float(m.group(3))}
        for m in re.finditer(
            r"\[ITER (\d+)\] Evaluating (\w+): L1 ([\d.]+) PSNR ([\d.]+)",
            captured.getvalue(),
        )
    ]
    end_shell = shell_stats()

    # Per-view final test PSNR.
    per_view = []
    for b, bank in enumerate(scene.get_test_banks()):
        for i in range(bank.count):
            cam, gt = bank.pick(jnp.int32(i))
            img = jnp.clip(trainer.render_view(cam), 0.0, 1.0)
            per_view.append(round(float(psnr_fn(img, gt).mean()), 3))

    return {
        "sky_gaussians": sky_n,
        "cameras_extent": round(ext, 3),
        "wall_clock_s": round(wall, 1),
        "test_curve": [e for e in evals if e["split"] == "test"],
        "final_test_psnr": round(float(np.mean(per_view)), 3),
        "per_view_psnr": per_view,
        "shell_at_init": start_shell,
        "shell_at_end": end_shell,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=4000)
    ap.add_argument("--sky", type=int, default=2000)
    ap.add_argument("--scene_dir", default="/tmp/gsjax_sky_scene")
    ap.add_argument("--out", default="artifacts/sky_run.json")
    ap.add_argument("--max_instances", type=int, default=1_048_576)
    ap.add_argument("--max_rows", type=int, default=524_288)
    args = ap.parse_args()

    from tools.synthetic_scene import generate

    if not os.path.exists(
        os.path.join(args.scene_dir, "transforms_train.json")
    ):
        print("generating unbounded-style scene ...", flush=True)
        generate(args.scene_dir, res=300, n_train=48, n_test=8)

    import jax

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_compile_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    # Queue timeouts send SIGTERM; still write whatever finished.
    import signal

    def _term(_sig, _frm):
        raise KeyboardInterrupt("SIGTERM")

    signal.signal(signal.SIGTERM, _term)

    budgets = (args.max_instances, args.max_rows)
    results = {}
    try:
        # sky_on FIRST: it is the deliverable with no other evidence; the
        # baseline can be cut by a timeout and rerun later.
        for tag, sky_n in (("sky_on", args.sky), ("sky_off", 0)):
            print(f"=== {tag} ===", flush=True)
            results[tag] = run_one(
                args.scene_dir, f"/tmp/gsjax_sky_model_{tag}",
                args.iterations, sky_n, budgets,
            )
    except (Exception, KeyboardInterrupt) as e:  # noqa: BLE001
        results["crashed"] = f"{type(e).__name__}: {e}"[:300]

    if "sky_on" in results and "sky_off" in results:
        results["delta_test_psnr"] = round(
            results["sky_on"]["final_test_psnr"]
            - results["sky_off"]["final_test_psnr"], 3
        )
    if "sky_on" in results:
        results["shell_survived_prune"] = (
            results["sky_on"]["shell_at_end"]["n_far_shell"] > 0
        )
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: results[k] for k in
                      ("delta_test_psnr", "shell_survived_prune", "crashed")
                      if k in results}))
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
