"""Train-to-quality demonstration on the real TPU (VERDICT round-1 #2).

Generates the ray-traced multi-sphere dataset (tools/synthetic_scene.py),
trains with the DEFAULT published schedule for --iterations steps (SH ramp
to 3, densify from 500, opacity resets every 3k, self-sizing raster
budgets, capacity growth), evaluating held-out PSNR at checkpoints, and
writes the full trajectory (PSNR curve, point counts, budget events,
wall-clock) to artifacts/quality_run.json.

Usage: python tools/quality_run.py [--iterations 6000] [--out artifacts/quality_run.json]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iterations", type=int, default=6000)
    ap.add_argument("--out", default="artifacts/quality_run.json")
    ap.add_argument("--scene_dir", default="/tmp/gsjax_quality_scene")
    ap.add_argument("--model_dir", default="/tmp/gsjax_quality_model")
    # Pre-sized shapes (VERDICT r3 #3): every budget/capacity growth is a
    # full step recompile — minutes each over the TPU tunnel with a cold
    # cache. Sizing to the r3 run's final scale from iteration 0 costs some
    # early-iteration budget-rate waste but keeps the whole run on a handful
    # of executables AND guarantees zero dropped pairs without mid-run
    # growth events. adapt_budgets stays on as a backstop.
    ap.add_argument("--capacity", type=int, default=None)
    ap.add_argument("--max_instances", type=int, default=262_144)
    ap.add_argument("--max_rows", type=int, default=131_072)
    args = ap.parse_args()

    from tools.synthetic_scene import generate

    if not os.path.exists(
        os.path.join(args.scene_dir, "transforms_train.json")
    ):
        print("generating scene ...", flush=True)
        generate(args.scene_dir)

    import jax

    # Remote TPU compiles cost minutes on this host; cache them, pre-size
    # the capacity, and pin the raster budgets so the only distinct step
    # graphs are the SH-degree ramp's.
    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_compile_cache"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from torch.utils.tensorboard import SummaryWriter

    from gsjax.config import ModelConfig, OptimizationConfig, RasterConfig
    from gsjax.scene import Scene
    from gsjax.train.trainer import Trainer

    model_cfg = ModelConfig(
        source_path=args.scene_dir, model_path=args.model_dir, eval=True
    )
    opt_cfg = OptimizationConfig(iterations=args.iterations)
    os.makedirs(args.model_dir, exist_ok=True)
    # Auto-resume from the newest periodic checkpoint: the tunneled TPU
    # client can wedge mid-run (one TCP stream dies while fresh clients
    # work), and bit-exact resume turns that from a lost multi-hour run
    # into a lost <=1000 iterations. A watchdog (tools/chain_r4 scripts)
    # kills the stale PID; this picks the run back up.
    import re as _re

    ckpts = sorted(
        (
            int(m.group(1)), os.path.join(args.model_dir, f)
        )
        for f in os.listdir(args.model_dir)
        if (m := _re.fullmatch(r"chkpnt(\d+)\.npz", f))
    )
    import numpy as np

    # Newest READABLE checkpoint: saves are atomic now, but a truncated
    # archive from an older run (SIGTERM mid-np.savez) must not wedge every
    # resume attempt — validate before committing to one.
    resume_from = None
    for _it, _path in reversed(ckpts):
        try:
            with np.load(_path) as _z:
                _ = _z["params.features_rest"].shape
            resume_from = _path
            break
        except Exception as e:  # truncated/corrupt: fall back to older
            print(f"skipping unreadable checkpoint {_path}: {e}", flush=True)
    if resume_from:
        print(f"resuming from {resume_from}", flush=True)
    scene = Scene(model_cfg, capacity=args.capacity or 65_536)
    # Round-4 (VERDICT r3 #3): a quality artifact must show ZERO dropped
    # (gaussian, tile) pairs. The trainer now grows budgets PROACTIVELY at
    # 60% occupancy (plus a post-densify jump estimate) and never shrinks
    # while densification is active — so start snug and let it track the
    # scene; any OVERFLOW line in budget_events is the loud failure signal.
    raster_cfg = RasterConfig(
        tile_w=32, tile_h=32,
        max_instances=args.max_instances, max_rows=args.max_rows,
    )
    tb = SummaryWriter(args.model_dir)

    class DiagnosticTrainer(Trainer):
        """Appends the live point count to every eval line so the artifact
        carries the densification trajectory (VERDICT r4 #5: diagnose the
        train/test gap against the point budget)."""

        def _report_test(self, iteration, first_test=False):
            super()._report_test(iteration, first_test)
            print(f"\n[ITER {iteration}] total_points {self.n_alive()}")

    trainer = DiagnosticTrainer(
        scene, model_cfg, opt_cfg, raster_cfg=raster_cfg, tb_writer=tb,
        adapt_budgets=True, start_checkpoint=resume_from,
    )

    test_iters = sorted(
        {i for i in (200, 500, 1000, 1500, 2000, 3000, 4000, 5000, 6000,
                     8000, 10_000, 15_000, 20_000, 25_000, 30_000)
         if i <= args.iterations} | {args.iterations}
    )

    # Capture the trainer's stdout (budget adaptation + eval lines are
    # printed there) while still forwarding to the console.
    class Tee(io.TextIOBase):
        def __init__(self, *sinks):
            self.sinks = sinks

        def write(self, s):
            for k in self.sinks:
                k.write(s)
                k.flush()
            return len(s)

    captured = io.StringIO()
    real_stdout = sys.stdout
    sys.stdout = Tee(real_stdout, captured)
    # The measurement queue boxes this run with `timeout` (SIGTERM) and the
    # round driver kills it at the wall — both must still produce the
    # partial artifact, so route SIGTERM through the KeyboardInterrupt path
    # (the sanctioned "stop now but keep the curve" exit).
    import signal

    def _term(_sig, _frm):
        raise KeyboardInterrupt("SIGTERM")

    signal.signal(signal.SIGTERM, _term)
    t0 = time.perf_counter()
    crashed = None
    interrupted = False
    try:
        trainer.train(
            test_iterations=tuple(test_iters),
            # Intermediate saves: a mid-run tunnel death must not lose the
            # whole multi-hour run (the artifact below is written from the
            # captured eval log either way).
            save_iterations=tuple(
                sorted({i for i in (5000, 10_000) if i < args.iterations}
                       | {args.iterations})
            ),
            # Every 2000: a 2M-capacity checkpoint is ~2 GB over a
            # 20 MB/s D2H link (~100 s) — 1000-step cadence alone cost
            # ~0.1 s/it of the r4 wall.
            checkpoint_iterations=tuple(
                range(2000, args.iterations + 1, 2000)
            ),
            # Post-densify (>15k) there are no %100 boundaries; full-epoch
            # windows amortize the per-window tunnel sync (r4: ~0.84 s/it
            # wall vs ~0.1 s/it device time).
            max_window=256,
        )
    except (Exception, KeyboardInterrupt) as e:  # noqa: BLE001 — still write
        # the partial artifact; SIGINT on the exact PID is the sanctioned
        # "stop now but keep the curve" path for a wall-clock-boxed run.
        crashed = f"{type(e).__name__}: {e}"[:300]
        interrupted = isinstance(e, KeyboardInterrupt)
    finally:
        sys.stdout = real_stdout
    wall = time.perf_counter() - t0
    tb.close()

    # Final held-out eval with SSIM and rendered-image dumps (VERDICT r2:
    # PSNR alone under-reports; include SSIM and PNGs to eyeball).
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from gsjax.image_metrics import psnr as psnr_fn
    from gsjax.train.loss import ssim as ssim_fn

    render_dir = os.path.join(
        os.path.dirname(args.out) or ".", "quality_renders"
    )
    os.makedirs(render_dir, exist_ok=True)
    final_views = []
    renders = {}
    # An interrupt leaves the backend healthy — still score the final state.
    banks = [] if (crashed and not interrupted) else scene.get_test_banks()
    for b, bank in enumerate(banks):
        for i in range(bank.count):
            cam, gt = bank.pick(jnp.int32(i))
            img = jnp.clip(trainer.render_view(cam), 0.0, 1.0)
            final_views.append(
                {
                    "view": f"{b}_{i}",
                    "psnr": round(float(psnr_fn(img, gt).mean()), 3),
                    "ssim": round(float(ssim_fn(img, gt)), 4),
                }
            )
            renders[f"{b}_{i}"] = (np.asarray(img), np.asarray(jnp.clip(gt, 0, 1)))
    # Dump the WORST four held-out views (side-by-side render|gt) — the
    # diagnosis targets the views dragging the mean down, not the first four.
    for fv in sorted(final_views, key=lambda v: v["psnr"])[:4]:
        img, gt = renders[fv["view"]]
        pair = np.concatenate([img, gt], axis=2)
        Image.fromarray(
            np.round(pair.transpose(1, 2, 0) * 255).astype(np.uint8)
        ).save(os.path.join(
            render_dir, f"worst_{fv['view']}_psnr{fv['psnr']:.1f}.png"
        ))

    # Floater / overdraw diagnostics from the final state (VERDICT r4 #5).
    diag = None
    if not (crashed and not interrupted):
        p = trainer.state.params
        alive = np.asarray(trainer.state.aux.alive)
        xyz = np.asarray(p.xyz)[alive]
        opac = np.asarray(p.get_opacity()).reshape(-1)[alive]
        ext = float(scene.cameras_extent)
        center = xyz.mean(axis=0)
        r = np.linalg.norm(xyz - center, axis=-1)
        diag = {
            "cameras_extent": round(ext, 3),
            "n_alive": int(alive.sum()),
            "opacity_mean": round(float(opac.mean()), 4),
            "opacity_frac_below_0.1": round(float((opac < 0.1).mean()), 4),
            "radius_p50": round(float(np.percentile(r, 50)), 3),
            "radius_p99": round(float(np.percentile(r, 99)), 3),
            "frac_outside_extent": round(float((r > ext).mean()), 4),
            "frac_outside_extent_opaque": round(
                float(((r > ext) & (opac > 0.5)).mean()), 5
            ),
        }

    def _maybe(f):
        try:
            return f()
        except Exception:  # noqa: BLE001 — artifact must be written regardless
            return None

    log = captured.getvalue()
    evals = [
        {"iteration": int(m.group(1)), "split": m.group(2),
         "l1": float(m.group(3)), "psnr": float(m.group(4))}
        for m in re.finditer(
            r"\[ITER (\d+)\] Evaluating (\w+): L1 ([\d.]+) PSNR ([\d.]+)", log
        )
    ]
    budget_events = re.findall(
        r"\[ITER \d+\] raster budget[s]? [^\n]+", log
    )
    capacity_events = re.findall(
        r"\[ITER \d+\] growing capacity [^\n]+", log
    )
    points_curve = [
        {"iteration": int(m.group(1)), "points": int(m.group(2))}
        for m in re.finditer(r"\[ITER (\d+)\] total_points (\d+)", log)
    ]
    test_curve = [e for e in evals if e["split"] == "test"]

    result = {
        "crashed": crashed,
        # Non-null when a tunnel-wedge watchdog restart resumed the run:
        # the eval curve below then starts after the resume point (earlier
        # points live in the previous attempt's log; merged by the round
        # harness when assembling the final artifact).
        "resumed_from": resume_from,
        "dataset": "ray-traced spheres+checkerboard (tools/synthetic_scene.py)",
        "resolution": 400,
        "iterations": args.iterations,
        "backend": jax.default_backend(),
        "wall_clock_s": round(wall, 1),
        # n_alive reads device arrays — unreadable if the backend died.
        "final_points": _maybe(lambda: int(trainer.n_alive())),
        "capacity": _maybe(lambda: int(trainer.state.params.capacity)),
        "final_raster_budgets": {
            "max_instances": trainer.raster_cfg.max_instances,
            "max_rows": trainer.raster_cfg.max_rows,
        },
        "budget_events": budget_events,
        "capacity_events": capacity_events,
        "points_curve": points_curve,
        "final_state_diagnostics": diag,
        "test_psnr_curve": test_curve,
        "train_evals": [e for e in evals if e["split"] == "train"],
        "final_test_psnr": test_curve[-1]["psnr"] if test_curve else None,
        "final_per_view": final_views,
        "final_test_ssim": (
            round(float(np.mean([v["ssim"] for v in final_views])), 4)
            if final_views else None
        ),
        "renders_dir": render_dir,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1)
    print(f"\nquality run complete: final test PSNR "
          f"{result['final_test_psnr']} in {wall:.0f}s "
          f"-> {args.out}", flush=True)


if __name__ == "__main__":
    main()
