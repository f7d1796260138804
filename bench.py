"""Headline benchmark: rasterizer forward+backward throughput at 1080p.

Mirrors BASELINE.json config 2 — ~500k Gaussians, SH degree 3, full tile
binning, L1 loss, gradient w.r.t. every Gaussian parameter — and reports
pixels/s/chip over the fwd+bwd pass.

Baseline: the reference CUDA diff-gaussian-rasterization sustains roughly
15 fwd+bwd iterations/s at 1080p on an RTX/A6000-class GPU mid-training
(derived from the ~25-30 min/30k-iteration wall-clocks the upstream repo's
issue tracker and paper report for garden-scale scenes; the repo itself
publishes no number — BASELINE.md). 15 it/s x 1920x1080 px = 31.1 M
pixels/s fwd+bwd.

Prints ONE JSON line:
  {"metric": "pixels_per_s_fwd_bwd_1080p", "value": N, "unit": "pixel/s",
   "vs_baseline": N / 31.1e6}
"""

from __future__ import annotations

import json
import sys
import time

BASELINE_PIXELS_PER_S = 31.1e6

WIDTH, HEIGHT = 1920, 1080
N_GAUSSIANS = 500_000
SH_DEGREE = 3
WARMUP = 3
ITERS = 20


def _emit_error_and_exit(msg: str) -> None:
    print(
        json.dumps(
            {
                "metric": "pixels_per_s_fwd_bwd_1080p",
                "value": 0.0,
                "unit": "pixel/s",
                "vs_baseline": 0.0,
                "error": msg[:500],
            }
        )
    )
    raise SystemExit(1)


def _probe_backend_subprocess(timeout_s: float) -> tuple[bool, str]:
    """One-op backend probe in a SUBPROCESS with a hard timeout.

    The tunneled TPU client has two failure modes: a fast UNAVAILABLE raise
    and an indefinite HANG inside backend init (nothing listening on the
    relay ports). An in-process try/except only covers the first; a hung
    client can't be recovered in-process, so probe out-of-process and only
    initialize this process's backend once a probe succeeds."""
    import subprocess

    code = (
        "import jax,jax.numpy as jnp,numpy as np;"
        "x=(jnp.ones((8,128))@jnp.ones((128,8)));"
        "print('ok',jax.default_backend(),float(np.asarray(x.ravel()[0])))"
    )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            timeout=timeout_s,
            cwd="/root/repo",  # axon plugin discovery needs the repo cwd
            capture_output=True,
            text=True,
        )
    except subprocess.TimeoutExpired:
        return False, f"probe hang (> {timeout_s:.0f}s)"
    if r.returncode == 0:
        return True, r.stdout.strip()
    return False, (r.stderr or r.stdout).strip()[-300:]


def _init_backend_with_retry(attempts: int = 3, backoff_s: float = 150.0) -> str:
    """Initialize the JAX backend, retrying on transient TPU-tunnel failures
    (fast UNAVAILABLE raises AND hangs — see _probe_backend_subprocess).
    On final failure, emit a parseable JSON error line (not a bare
    traceback) so the driver records a structured artifact."""
    last = ""
    for i in range(attempts):
        ok, detail = _probe_backend_subprocess(timeout_s=300.0)
        if ok:
            break
        last = detail
        if i + 1 < attempts:
            print(
                f"# backend probe failed (attempt {i + 1}/{attempts}): "
                f"{detail}; retrying in {backoff_s:.0f}s",
                file=sys.stderr,
            )
            time.sleep(backoff_s)
    else:
        _emit_error_and_exit(f"backend init failed after {attempts} probes: {last}")

    import jax

    try:
        return jax.default_backend()
    except Exception as e:  # noqa: BLE001 — backend init raises RuntimeError subclasses
        _emit_error_and_exit(
            f"backend init failed after successful probe: {type(e).__name__}: {e}"
        )
        raise  # unreachable


def main() -> None:
    backend = _init_backend_with_retry()

    import jax
    import jax.numpy as jnp

    from gsjax.utils.general import enable_compile_cache

    enable_compile_cache()  # minutes-per-compile over the TPU tunnel

    from gsjax.config import RasterConfig
    from gsjax.render.api import render
    from gsjax.synthetic import look_at_origin_camera, random_scene
    from gsjax.train.loss import l1_loss

    on_tpu = backend == "tpu"
    params, aux = random_scene(
        N_GAUSSIANS,
        capacity=N_GAUSSIANS,
        sh_degree=SH_DEGREE,
        seed=0,
        spread=2.5,
        scale_range=(0.004, 0.03),
    )
    camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
    # At 32x32 tiles this scene has exactly 1,155,281 (alpha >= 1/255)
    # gaussian-tile pairs and 482,997 tile-row runs; the budgets below hold
    # them with no overflow, so the measured step composites every
    # contributing instance (the CUDA reference's 16x16 bounding-square
    # duplication would emit ~4.7M pairs for the same scene). Budgets are
    # deliberately snug — in real training the self-sizing budget
    # adaptation keeps the same ~few-percent headroom — because every
    # expansion/gather/sort stage pays at BUDGET rate, not true-count rate.
    # 32x32 tiles beat the reference's 16x16 granularity on TPU: every
    # instance-rate stage (expansion, gathers, sort, grad reduction)
    # scales with the pair count, which is 2.5x smaller, while the
    # composite kernels' per-chunk cost barely grows (measured in
    # tools/profile_kernels.py).
    cfg = RasterConfig(
        tile_w=32, tile_h=32,
        max_instances=1_179_648, max_rows=524_288, interpret=not on_tpu,
    )
    bg = jnp.zeros(3, jnp.float32)
    gt = jnp.zeros((3, HEIGHT, WIDTH), jnp.float32)
    alive = aux.alive

    def loss_fn(params, offset):
        out = render(
            params,
            camera,
            active_sh_degree=SH_DEGREE,
            bg_color=bg,
            cfg=cfg,
            alive=alive,
            mean2d_offset=offset,
        )
        return l1_loss(out.image, gt)

    @jax.jit
    def step(params, offset):
        loss, (g_params, g_offset) = jax.value_and_grad(
            loss_fn, argnums=(0, 1)
        )(params, offset)
        # Zero-magnitude SGD update chains successive steps through the
        # gradients, exactly like real training — successive dispatches
        # cannot overlap or be elided, so wall-clock is honest.
        new_params = jax.tree.map(lambda p, g: p - 0.0 * g, params, g_params)
        return loss, new_params

    offset = jnp.zeros((params.capacity, 2), jnp.float32)
    for _ in range(WARMUP):
        loss, params = step(params, offset)
    jax.block_until_ready(params)

    import numpy as np

    t0 = time.perf_counter()
    for _ in range(ITERS):
        loss, params = step(params, offset)
    # D2H read fences the chain (block_until_ready alone can return before
    # execution completes on tunneled-TPU platforms).
    float(np.asarray(loss))
    dt = time.perf_counter() - t0

    steps_per_s = ITERS / dt
    pixels_per_s = steps_per_s * WIDTH * HEIGHT
    print(
        json.dumps(
            {
                "metric": "pixels_per_s_fwd_bwd_1080p",
                "value": round(pixels_per_s, 1),
                "unit": "pixel/s",
                "vs_baseline": round(pixels_per_s / BASELINE_PIXELS_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
