"""Host-side training orchestration around the jitted train step.

The gsjax counterpart of the reference `training()` driver
(reference: train.py:31-132): epoch-shuffled camera sampling, SH degree
schedule, densify/prune cadence, opacity resets, PLY saves, checkpoints,
test-set evaluation, TensorBoard logging, and remote-viewer polling.

TPU specifics:
* All hot work is one donated jitted step per (camera bank, SH degree);
  densify/prune is a second jitted function invoked every 100 iterations.
* The Gaussian buffer has static capacity; when densification fills it,
  the buffers are grown (host-side re-pad to the next power of two) and
  the step recompiles once per growth — the reference reallocates tensors
  EVERY densify instead (reference: scene/gaussian_model.py:307-327).
"""

from __future__ import annotations

import os
import random
import time

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.config import (
    MIN_RASTER_BUDGET,
    pow2_budget,
    ModelConfig,
    OptimizationConfig,
    PipelineConfig,
    RasterConfig,
)
from gsjax.image_metrics import psnr as psnr_fn
from gsjax.model import (
    DEAD_OPACITY_FILL,
    DEAD_SCALING_FILL,
    GaussianAux,
    GaussianParams,
)
from gsjax.render.api import render
from gsjax.scene import CameraBank, Scene
from gsjax.train.checkpoint import load_checkpoint, save_checkpoint
from gsjax.train.densify import densify_and_prune, reset_opacity
from gsjax.train.optimizer import AdamState, adam_init
from gsjax.train.step import TrainState, train_steps


def _pow2_chunks(n: int) -> list[int]:
    """Binary decomposition of a window length, largest chunk first
    (100 -> [64, 32, 4]). Scan graphs compile per distinct length; this
    bounds the set of lengths ever compiled to the powers of two."""
    out = []
    bit = 1 << max(n.bit_length() - 1, 0)
    while n:
        if n >= bit:
            out.append(bit)
            n -= bit
        bit >>= 1
    return out


def grow_capacity(state: TrainState, new_cap: int) -> TrainState:
    """Re-pad every per-Gaussian buffer to new_cap (recompile trigger)."""
    old = state.params.capacity
    extra = new_cap - old
    if extra <= 0:
        return state

    def pad(x, fill=0.0):
        if x.ndim == 0 or x.shape[0] != old:
            return x
        return jnp.pad(
            x, [(0, extra)] + [(0, 0)] * (x.ndim - 1), constant_values=fill
        )

    params = GaussianParams(
        xyz=pad(state.params.xyz),
        features_dc=pad(state.params.features_dc),
        features_rest=pad(state.params.features_rest),
        scaling=pad(state.params.scaling, DEAD_SCALING_FILL),
        rotation=pad(state.params.rotation).at[old:, 0].set(1.0),
        opacity=pad(state.params.opacity, DEAD_OPACITY_FILL),
    )
    opt = AdamState(
        count=state.opt.count,
        mu=jax.tree.map(pad, state.opt.mu),
        nu=jax.tree.map(pad, state.opt.nu),
    )
    aux = GaussianAux(
        alive=pad(state.aux.alive, False),
        max_radii2d=pad(state.aux.max_radii2d),
        xyz_grad_accum=pad(state.aux.xyz_grad_accum),
        denom=pad(state.aux.denom),
    )
    return TrainState(params=params, opt=opt, aux=aux, step=state.step)


_densify_jit = jax.jit(
    densify_and_prune,
    static_argnames=(
        "grad_threshold",
        "min_opacity",
        "extent",
        "max_screen_size",
        "percent_dense",
    ),
    donate_argnums=(0, 1, 2),
)
_reset_opacity_jit = jax.jit(reset_opacity, donate_argnums=(0, 1))


class Trainer:
    def __init__(
        self,
        scene: Scene,
        model_cfg: ModelConfig,
        opt_cfg: OptimizationConfig,
        pipe_cfg: PipelineConfig = PipelineConfig(),
        raster_cfg: RasterConfig | None = None,
        start_checkpoint: str | None = None,
        tb_writer=None,
        gui=None,
        quiet: bool = False,
        profile_dir: str | None = None,
        mesh=None,
        adapt_budgets: bool = True,
        use_orbax: bool = False,
    ):
        self.scene = scene
        # use_orbax=True writes/reads training checkpoints with Orbax
        # (sharded/multi-host-capable; SURVEY.md §5.4) instead of the
        # single-host .npz default. Restore auto-detects the format (Orbax
        # checkpoints are directories).
        self.use_orbax = use_orbax
        # adapt_budgets=False pins raster budgets to the given raster_cfg
        # (no grow-on-overflow and no shrink-after-quiet recompiles) — for
        # environments where each recompile is expensive; overflow is then
        # the caller's responsibility to avoid.
        self.adapt_budgets = adapt_budgets
        # Optional jax.sharding.Mesh with ("data", "tile") axes: trains with
        # the mesh-sharded step (gsjax/parallel/step.py) instead of the
        # single-device scan windows.
        self.mesh = mesh
        self._sharded_cache: dict = {}
        self.model_cfg = model_cfg
        self.opt_cfg = opt_cfg
        self.pipe_cfg = pipe_cfg
        self.raster_cfg = raster_cfg or RasterConfig(
            interpret=jax.default_backend() != "tpu"
        )
        self.tb = tb_writer
        self.gui = gui
        self.quiet = quiet
        # jax.profiler trace window (SURVEY.md §5.1); steps 100..110 catch
        # a steady-state window past the initial compiles.
        self.profile_dir = profile_dir
        self._profile_window = (100, 110)
        self._profiling = False

        self.active_sh_degree = 0
        self.spatial_lr_scale = float(scene.cameras_extent)
        self.first_iter = 0

        restored_extra: dict = {}
        if start_checkpoint:
            if os.path.isdir(start_checkpoint):
                from gsjax.train.checkpoint import load_checkpoint_orbax

                state, sh_deg, lr_scale, restored_extra = (
                    load_checkpoint_orbax(start_checkpoint)
                )
            else:
                from gsjax.train.checkpoint import load_checkpoint_extra

                state, sh_deg, lr_scale, restored_extra = (
                    load_checkpoint_extra(start_checkpoint)
                )
            self.state = state
            self.active_sh_degree = sh_deg
            self.spatial_lr_scale = lr_scale
            self.first_iter = int(state.step)
            print(f"Restored checkpoint at iteration {self.first_iter}")
        else:
            self.state = TrainState(
                params=scene.params,
                opt=adam_init(scene.params),
                aux=scene.aux,
                step=jnp.zeros((), jnp.int32),
            )

        bgv = [1.0, 1.0, 1.0] if model_cfg.white_background else [0.0, 0.0, 0.0]
        self.background = jnp.asarray(bgv, jnp.float32)
        self.banks = scene.get_train_banks()
        # Per-bank shuffled view stacks (popped from the END). A private
        # Random instance (not the global module) so its state can be
        # captured into checkpoints for exact resume parity.
        self._bank_stacks: list[list[int]] = [[] for _ in self.banks]
        self._shuffler = random.Random(0)
        self._render_cache: dict = {}
        self._rng = np.random.default_rng(0)
        self._budget_quiet_windows = 0
        self._budget_quiet_peaks = (0, 0)
        self._last_peaks = (0, 0)
        self._last_alive = 0
        self._key = jax.random.PRNGKey(0)
        if restored_extra:
            self._restore_host_state(restored_extra)

    # ---------------------------------------------------------------- utils
    def n_alive(self) -> int:
        return int(self.state.aux.n_alive())

    def render_view(
        self,
        camera,
        scaling_modifier: float = 1.0,
        shs_python: bool | None = None,
        cov3d_python: bool | None = None,
        fast: bool = False,
    ):
        """One render through the public API (used by GUI + eval). The
        *_python flags select the standalone mirror math paths
        (reference pipe.convert_SHs_python / compute_cov3D_python,
        gaussian_renderer/__init__.py:57-82); they default to the
        PipelineConfig settings. fast=True opts into the inference-only
        bf16 forward (display-accuracy; used by the GUI frame path)."""
        import dataclasses

        shs = self.pipe_cfg.convert_SHs_python if shs_python is None else shs_python
        cov = (
            self.pipe_cfg.compute_cov3D_python
            if cov3d_python is None
            else cov3d_python
        )
        key = (
            camera.width, camera.height, self.active_sh_degree, shs, cov,
            fast, self.raster_cfg,
        )
        if key not in self._render_cache:
            cfg = (
                dataclasses.replace(self.raster_cfg, fast_fwd=True)
                if fast else self.raster_cfg
            )

            @jax.jit
            def _r(params, camera, alive, bg, sm):
                return render(
                    params,
                    camera,
                    active_sh_degree=self.active_sh_degree,
                    bg_color=bg,
                    cfg=cfg,
                    alive=alive,
                    scaling_modifier=sm,
                    convert_shs_outside=shs,
                    compute_cov3d_outside=cov,
                ).image

            self._render_cache[key] = _r
        return self._render_cache[key](
            self.state.params,
            camera,
            self.state.aux.alive,
            self.background,
            jnp.float32(scaling_modifier),
        )

    def _sharded_steps_for(self, bank: CameraBank):
        """Cached mesh-sharded scanned-window train step per (resolution,
        raster config). The SH degree is a traced operand (passed at call
        time), so one executable serves the whole SH ramp — same as the
        single-device path."""
        from gsjax.parallel.step import make_sharded_train_steps

        key = (bank.width, bank.height, self.raster_cfg)
        if key not in self._sharded_cache:
            self._sharded_cache[key] = make_sharded_train_steps(
                self.mesh,
                height=bank.height,
                width=bank.width,
                active_sh_degree=self.active_sh_degree,
                opt_cfg=self.opt_cfg,
                raster_cfg=self.raster_cfg,
                spatial_lr_scale=self.spatial_lr_scale,
            )
        return self._sharded_cache[key]

    # ------------------------------------------------------------- main loop
    def _next_boundary(self, it: int, events) -> int:
        """Last iteration (inclusive) of the window starting at it+1: the
        nearest upcoming event at which host-side work must run."""
        opt = self.opt_cfg
        cands = [opt.iterations]
        # SH schedule boundary: the bump applies to iteration k*1000 itself
        # (reference: train.py:71-73), so windows must END at k*1000 - 1 —
        # but only while the ramp is still running; once the degree is
        # maxed the boundary would just fragment post-densify windows.
        if self.active_sh_degree < self.state.params.max_sh_degree:
            cands.append((it // 1000 + 1) * 1000 - 1)
        if it < opt.densify_until_iter:
            d = opt.densification_interval
            cands.append((it // d + 1) * d)
            r = opt.opacity_reset_interval
            cands.append((it // r + 1) * r)
            cands.append(opt.densify_from_iter)
            cands.append(opt.densify_until_iter)
        cands.extend(e for e in events if e > it)
        if self.profile_dir is not None:
            cands.extend(w for w in self._profile_window if w > it)
        return min(c for c in cands if c > it)

    def _next_window(self, max_len: int) -> tuple[int, list[int]]:
        """Pop up to max_len views from ONE bank of the epoch stacks.

        Reference semantics are pop-one-random-view-per-iteration from the
        whole shuffled epoch (train.py:76-78); scan windows constrain a
        window to one compiled step, i.e. one bank (resolution). The
        faithful window-level analog: pick the bank with probability
        proportional to its remaining views (the chance the reference's
        next draw lands in that bank), then pop the window from that bank's
        shuffled stack. With a single bank this IS the reference's
        shuffled-stack pop; with several, banks interleave randomly at
        window granularity instead of running one bank to exhaustion
        (the round-3 deviation)."""
        if not any(self._bank_stacks):
            self._next_view_refill()
        nonempty = [b for b, s in enumerate(self._bank_stacks) if s]
        if len(nonempty) == 1:
            bank_idx = nonempty[0]
        else:
            bank_idx = self._shuffler.choices(
                nonempty,
                weights=[len(self._bank_stacks[b]) for b in nonempty],
            )[0]
        stack = self._bank_stacks[bank_idx]
        cams = [stack.pop() for _ in range(min(max_len, len(stack)))]
        return bank_idx, cams

    def _next_view_refill(self) -> None:
        self._bank_stacks = []
        for bank in self.banks:
            idxs = list(range(bank.count))
            self._shuffler.shuffle(idxs)
            self._bank_stacks.append(idxs)

    def _host_state_snapshot(self) -> dict:
        """Host-side training state that exact resume parity needs beyond
        the device TrainState: the densify split key, the background/bank
        RNGs, the mid-epoch camera stacks, and the adaptive raster budgets
        (reference capture/restore: scene/gaussian_model.py:61-93 — which
        does NOT capture RNG and so cannot resume bit-exactly; gsjax can)."""
        import pickle

        flat = [
            (b, i) for b, stack in enumerate(self._bank_stacks) for i in stack
        ]
        return {
            "key": np.asarray(self._key),
            "np_rng": np.frombuffer(
                pickle.dumps(self._rng.bit_generator.state), np.uint8
            ),
            "shuffler": np.frombuffer(
                pickle.dumps(self._shuffler.getstate()), np.uint8
            ),
            "stacks": np.asarray(flat, np.int32).reshape(-1, 2),
            "budgets": np.asarray(
                [
                    self.raster_cfg.max_instances,
                    self.raster_cfg.max_rows,
                    self._budget_quiet_windows,
                    self._budget_quiet_peaks[0],
                    self._budget_quiet_peaks[1],
                    self._last_peaks[0],
                    self._last_peaks[1],
                    self._last_alive,
                ],
                np.int64,
            ),
        }

    def _restore_host_state(self, extra: dict) -> None:
        import dataclasses
        import pickle

        if "key" in extra:
            self._key = jnp.asarray(extra["key"])
        if "np_rng" in extra:
            self._rng.bit_generator.state = pickle.loads(
                extra["np_rng"].tobytes()
            )
        if "shuffler" in extra:
            self._shuffler.setstate(pickle.loads(extra["shuffler"].tobytes()))
        if "stacks" in extra:
            flat = np.asarray(extra["stacks"]).reshape(-1, 2)
            self._bank_stacks = [
                [int(i) for b2, i in flat if b2 == b]
                for b in range(len(self.banks))
            ]
        if "budgets" in extra:
            bud = np.asarray(extra["budgets"])
            self.raster_cfg = dataclasses.replace(
                self.raster_cfg,
                max_instances=int(bud[0]),
                max_rows=int(bud[1]),
            )
            self._budget_quiet_windows = int(bud[2])
            self._budget_quiet_peaks = (int(bud[3]), int(bud[4]))
            if bud.shape[0] >= 8:
                self._last_peaks = (int(bud[5]), int(bud[6]))
                self._last_alive = int(bud[7])

    def _save_checkpoint(self, path: str) -> None:
        saver = save_checkpoint
        if self.use_orbax:
            from gsjax.train.checkpoint import save_checkpoint_orbax

            saver = save_checkpoint_orbax
        saver(
            path,
            self.state,
            self.active_sh_degree,
            self.spatial_lr_scale,
            extra=self._host_state_snapshot(),
        )

    def train(
        self,
        test_iterations=(7_000, 30_000),
        save_iterations=(7_000, 30_000),
        checkpoint_iterations=(),
        debug_from: int = -1,
        max_window: int = 50,
    ) -> None:
        opt = self.opt_cfg
        iters = opt.iterations
        ema_loss = 0.0
        # --debug_from parity (reference: train.py:81-82 flips pipe.debug on
        # from this iteration): gsjax's closest debug facility is NaN
        # checking (jax_debug_nans) — arm it when the window begins. Window
        # boundaries land on events so the flag flips at the right step.
        events = sorted(
            set(test_iterations)
            | set(save_iterations)
            | set(checkpoint_iterations)
            | ({debug_from} if debug_from >= 0 else set())
        )
        if 0 <= debug_from <= self.first_iter:
            jax.config.update("jax_debug_nans", True)
        try:
            from tqdm import tqdm

            progress = tqdm(
                range(self.first_iter, iters),
                desc="Training progress",
                disable=self.quiet,
            )
        except ImportError:
            progress = None

        iteration = self.first_iter
        while iteration < iters:
            self._poll_gui(iteration + 1, iters)

            # SH degree schedule: the next step is iteration+1; bump when it
            # crosses a multiple of 1000 (reference: train.py:71-73).
            if (iteration + 1) % 1000 == 0:
                if self.active_sh_degree < self.state.params.max_sh_degree:
                    self.active_sh_degree += 1

            end = min(self._next_boundary(iteration, events), iters)
            if self.mesh is None:
                bank_idx, cams = self._next_window(min(max_window, end - iteration))
                w = len(cams)
                bank = self.banks[bank_idx]
                if opt.random_background:
                    bgs = jnp.asarray(self._rng.random((w, 3)), jnp.float32)
                else:
                    bgs = jnp.broadcast_to(self.background, (w, 3))

                t0 = time.perf_counter()
                # Dispatch the window as power-of-two scan chunks: the
                # scanned step compiles once per DISTINCT scan length, and
                # schedule boundaries (densify %100, SH %1000, test iters)
                # produce many one-off lengths — each a minutes-long remote
                # compile on a tunneled TPU. Binary decomposition bounds the
                # compiled-length set to <= log2(max_window)+1 sizes, all
                # persistent-cache-reusable across runs.
                parts = []
                off = 0
                for c in _pow2_chunks(w):
                    self.state, m = train_steps(
                        self.state,
                        bank,
                        jnp.asarray(cams[off:off + c], jnp.int32),
                        bgs[off:off + c],
                        active_sh_degree=self.active_sh_degree,
                        opt_cfg=opt,
                        raster_cfg=self.raster_cfg,
                        spatial_lr_scale=self.spatial_lr_scale,
                    )
                    parts.append(jax.tree.map(np.asarray, m))
                    off += c
                metrics = jax.tree.map(
                    lambda *xs: np.concatenate(xs), *parts
                )
                losses = metrics.loss
                dt = time.perf_counter() - t0
            else:
                # Mesh path: scanned window of optimizer updates, each over
                # a data-parallel batch of B same-bank cameras
                # (B = mesh.shape["data"]; B=1, W=1 matches the reference
                # loop exactly). Tiles shard over the "tile" axis; one
                # dispatch drives the whole window on-device, like the
                # single-device scanned path above.
                b = self.mesh.shape["data"]
                w = min(max_window, end - iteration)
                # Largest pow2 <= w: one compiled scan length per power of
                # two (see _pow2_chunks; here rounding down is enough since
                # the outer loop just runs more windows).
                w = 1 << (w.bit_length() - 1)
                bank_idx, cams = self._next_window(w * b)
                if len(cams) < w * b:  # cycle-pad a short epoch tail
                    cams = (cams * (-(-(w * b) // len(cams))))[: w * b]
                bank = self.banks[bank_idx]
                if opt.random_background:
                    bgs = jnp.asarray(self._rng.random((w, 3)), jnp.float32)
                else:
                    bgs = jnp.broadcast_to(self.background, (w, 3))

                t0 = time.perf_counter()
                idxs = jnp.asarray(cams, jnp.int32)
                gt = bank.gt_rgb[idxs].astype(jnp.float32) / 255.0
                gt = jnp.clip(gt, 0.0, 1.0) * (
                    bank.alpha[idxs].astype(jnp.float32) / 255.0
                )

                def wb(x):  # [w*b, ...] -> [w, b, ...]
                    return x.reshape((w, b) + x.shape[1:])

                steps_fn = self._sharded_steps_for(bank)
                self.state, metrics = steps_fn(
                    self.state,
                    wb(bank.views[idxs]),
                    wb(bank.full_projs[idxs]),
                    wb(bank.centers[idxs]),
                    wb(bank.tan_fovx[idxs]),
                    wb(bank.tan_fovy[idxs]),
                    wb(gt),
                    bgs,
                    self.active_sh_degree,
                )
                losses = np.asarray(metrics.loss).reshape(-1)
                dt = time.perf_counter() - t0
            if not np.isfinite(losses[-1]):
                # Debug snapshot on failure — the gsjax analog of the CUDA
                # rasterizer's --debug input dump (reference:
                # README.md:143-146): persist the state for offline replay.
                path = os.path.join(
                    self.scene.model_path or ".",
                    f"snapshot_it{iteration + w}.npz",
                )
                save_checkpoint(
                    path, self.state, self.active_sh_degree, self.spatial_lr_scale
                )
                raise FloatingPointError(
                    f"non-finite loss in window ending at {iteration + w}; "
                    f"state dumped to {path}"
                )

            self._maybe_adapt_budgets(
                iteration + w,
                int(np.max(np.asarray(metrics.num_instances))),
                int(np.max(np.asarray(metrics.num_rows))),
            )

            for k in range(w):
                it_k = iteration + 1 + k
                ema_loss = 0.4 * float(losses[k]) + 0.6 * ema_loss
                if self.tb is not None:
                    self.tb.add_scalar(
                        "train_loss_patches/l1_loss",
                        float(np.asarray(metrics.l1)[k]),
                        it_k,
                    )
                    self.tb.add_scalar(
                        "train_loss_patches/total_loss", float(losses[k]), it_k
                    )
                    self.tb.add_scalar("iter_time", dt / w * 1000.0, it_k)
            if progress is not None:
                progress.set_postfix({"Loss": f"{ema_loss:.7f}"})
                progress.update(w)

            iteration += w

            # Held-out evaluation runs BEFORE densify/opacity-reset at the
            # same iteration, matching the reference's in-iteration order
            # (training_report at train.py:105 precedes densification at
            # :113-123) — otherwise an eval landing on a reset iteration
            # measures the post-reset crater instead of the trained model.
            if iteration in test_iterations:
                self._report_test(
                    iteration, first_test=iteration == min(test_iterations)
                )
            if iteration in save_iterations:
                print(f"\n[ITER {iteration}] Saving Gaussians")
                self.scene.save(
                    iteration, self.state.params, self.state.aux.alive
                )

            # Densification (reference: train.py:113-123).
            if iteration < opt.densify_until_iter:
                if (
                    iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0
                ):
                    self._densify(iteration)
                if iteration % opt.opacity_reset_interval == 0 or (
                    self.model_cfg.white_background
                    and iteration == opt.densify_from_iter
                ):
                    params, optst = _reset_opacity_jit(
                        self.state.params, self.state.opt
                    )
                    self.state = self.state.replace(params=params, opt=optst)

            if 0 <= debug_from <= iteration:
                jax.config.update("jax_debug_nans", True)

            if self.profile_dir is not None:
                lo, hi = self._profile_window
                if not self._profiling and lo <= iteration < hi:
                    jax.profiler.start_trace(self.profile_dir)
                    self._profiling = True
                elif self._profiling and iteration >= hi:
                    jax.block_until_ready(self.state.params.xyz)
                    jax.profiler.stop_trace()
                    self._profiling = False

            if iteration in checkpoint_iterations:
                print(f"\n[ITER {iteration}] Saving Checkpoint")
                self._save_checkpoint(
                    os.path.join(
                        self.scene.model_path,
                        f"chkpnt{iteration}"
                        + ("" if self.use_orbax else ".npz"),
                    )
                )
        if progress is not None:
            progress.close()

    # ------------------------------------------------------------- internals
    def _densify(self, iteration: int) -> None:
        opt = self.opt_cfg
        size_threshold = (
            20 if iteration > opt.opacity_reset_interval else 0
        )  # reference: train.py:119
        self._key, sub = jax.random.split(self._key)
        # Skysphere mode: distance-scaled world-size prune threshold so the
        # far shell survives (see densify_and_prune's unbounded_center).
        center = None
        if getattr(self.model_cfg, "sky_gaussians", 0) > 0:
            center = jnp.asarray(self.scene.scene_center, jnp.float32)
        params, aux, optst, stats = _densify_jit(
            self.state.params,
            self.state.aux,
            self.state.opt,
            sub,
            unbounded_center=center,
            grad_threshold=opt.densify_grad_threshold,
            min_opacity=0.005,
            extent=float(self.scene.cameras_extent),
            max_screen_size=size_threshold,
            percent_dense=opt.percent_dense,
        )
        self.state = self.state.replace(params=params, aux=aux, opt=optst)
        n_alive = int(stats.n_alive)
        cap = self.state.params.capacity
        if n_alive > 0.75 * cap or int(stats.n_dropped) > 0:
            new_cap = max(cap * 2, 1024)
            print(
                f"\n[ITER {iteration}] growing capacity {cap} -> {new_cap} "
                f"(alive={n_alive}, dropped={int(stats.n_dropped)})"
            )
            self.state = grow_capacity(self.state, new_cap)
        self._post_densify_budget_check(iteration, n_alive)

    def _maybe_adapt_budgets(
        self, iteration: int, peak_inst: int, peak_rows: int
    ) -> None:
        """Keep the static instance/row budgets sized to the scene.

        The CUDA rasterizer sizes its key/value buffers dynamically every
        frame (SURVEY.md §2.3a); XLA's static shapes can't, so the budgets
        are compile-time. GROW PROACTIVELY at 60% occupancy: a window that
        actually overflows drops its deepest (gaussian, tile) pairs before
        the grow can react, so the budget must double while headroom still
        exists (densification raises peaks ~monotonically; a >1.67x
        single-window jump is the only way to still overflow, and
        _post_densify_budget_check covers the densify-event jumps that
        could do that). SHRINK only after a long stretch of deep underuse,
        to 4x the stretch's peak, and never while densification is active
        (work is still growing — a shrink then just schedules a future
        overflow, which is how the round-3 quality run dropped pairs).
        Either change re-jits the step once.
        """
        import dataclasses

        self._last_peaks = (peak_inst, peak_rows)
        if not getattr(self, "adapt_budgets", True):
            if (
                peak_inst > self.raster_cfg.max_instances
                or peak_rows > self.raster_cfg.max_rows
            ):
                print(
                    f"\n[ITER {iteration}] raster budget OVERFLOW "
                    f"(peaks {peak_inst}/{peak_rows} vs "
                    f"{self.raster_cfg.max_instances}/"
                    f"{self.raster_cfg.max_rows}); adaptation disabled — "
                    "deepest pairs were dropped"
                )
            return
        cfg = self.raster_cfg
        if peak_inst > cfg.max_instances or peak_rows > cfg.max_rows:
            print(
                f"\n[ITER {iteration}] raster budget OVERFLOW "
                f"(peaks {peak_inst}/{peak_rows} vs "
                f"{cfg.max_instances}/{cfg.max_rows}) — deepest pairs of "
                "the overflowing window were dropped; growing"
            )
        new_inst, new_rows = cfg.max_instances, cfg.max_rows
        if peak_inst > 0.6 * cfg.max_instances:
            new_inst = pow2_budget(peak_inst * 2)
        if peak_rows > 0.6 * cfg.max_rows:
            new_rows = pow2_budget(peak_rows * 2)
        if new_inst == cfg.max_instances and new_rows == cfg.max_rows:
            densifying = iteration < self.opt_cfg.densify_until_iter
            underused = not densifying and (
                (
                    peak_inst < 0.35 * cfg.max_instances
                    and cfg.max_instances > MIN_RASTER_BUDGET
                ) or (
                    peak_rows < 0.35 * cfg.max_rows
                    and cfg.max_rows > MIN_RASTER_BUDGET
                )
            )
            self._budget_quiet_peaks = (
                (
                    max(self._budget_quiet_peaks[0], peak_inst),
                    max(self._budget_quiet_peaks[1], peak_rows),
                )
                if underused
                else (0, 0)
            )
            self._budget_quiet_windows = (
                self._budget_quiet_windows + 1 if underused else 0
            )
            if self._budget_quiet_windows >= 50:
                # Size from the max over the whole quiet stretch, not just
                # the last window, so a fluctuating peak doesn't re-grow.
                new_inst = min(
                    pow2_budget(self._budget_quiet_peaks[0], headroom=4.0),
                    cfg.max_instances,
                )
                new_rows = min(
                    pow2_budget(self._budget_quiet_peaks[1], headroom=4.0),
                    cfg.max_rows,
                )
                self._budget_quiet_windows = 0
                self._budget_quiet_peaks = (0, 0)
        self._apply_budgets(
            iteration, new_inst, new_rows,
            f"peaks {peak_inst}/{peak_rows}",
        )

    def _apply_budgets(
        self, iteration: int, new_inst: int, new_rows: int, why: str
    ) -> None:
        import dataclasses

        cfg = self.raster_cfg
        if (new_inst, new_rows) == (cfg.max_instances, cfg.max_rows):
            return
        print(
            f"\n[ITER {iteration}] raster budgets {cfg.max_instances}/"
            f"{cfg.max_rows} -> {new_inst}/{new_rows} ({why})"
        )
        self.raster_cfg = dataclasses.replace(
            cfg, max_instances=new_inst, max_rows=new_rows
        )
        # Drop compiled executables for the outgrown config (cache keys
        # include raster_cfg; stale executables would otherwise live forever).
        self._render_cache = {
            k: v for k, v in self._render_cache.items() if k[-1] != cfg
        }
        self._sharded_cache.clear()

    def _post_densify_budget_check(self, iteration: int, n_alive: int) -> None:
        """Densify adds points BETWEEN windows, so the next window's peaks
        jump discontinuously — the only case the 60%-occupancy proactive
        grow of _maybe_adapt_budgets cannot see coming. Scale the last
        window's peaks by the alive-count growth (x1.2 margin) and grow
        NOW if the estimate crowds the budget, so no window ever overflows
        (a dropped (gaussian, tile) pair silently degrades training)."""
        prev = self._last_alive or n_alive
        self._last_alive = n_alive
        if not getattr(self, "adapt_budgets", True) or prev <= 0:
            return
        ratio = n_alive / prev
        est_inst = int(self._last_peaks[0] * ratio * 1.2)
        est_rows = int(self._last_peaks[1] * ratio * 1.2)
        cfg = self.raster_cfg
        new_inst, new_rows = cfg.max_instances, cfg.max_rows
        if est_inst > 0.6 * cfg.max_instances:
            new_inst = pow2_budget(est_inst * 2)
        if est_rows > 0.6 * cfg.max_rows:
            new_rows = pow2_budget(est_rows * 2)
        self._apply_budgets(
            iteration, new_inst, new_rows,
            f"post-densify estimate {est_inst}/{est_rows}, "
            f"alive {prev} -> {n_alive}",
        )

    def _eval_bank_fn(self, bank: CameraBank):
        """Cached scanned on-device eval over a view-index array: ONE
        dispatch computes per-view (l1, psnr) for the whole bank instead of
        a Python loop of per-view renders (per-view dispatch round trips
        dominate at reference scale — hundreds of held-out views at the
        7k/30k evals)."""
        shs = self.pipe_cfg.convert_SHs_python
        cov = self.pipe_cfg.compute_cov3D_python
        key = (
            "eval", bank.width, bank.height, self.active_sh_degree,
            shs, cov, self.raster_cfg,
        )
        if key not in self._render_cache:
            cfg = self.raster_cfg
            sh_deg = self.active_sh_degree

            @jax.jit
            def _eval(params, alive, bank, idxs, bg):
                def body(_, i):
                    cam, gt = bank.pick(i)
                    img = render(
                        params, cam, active_sh_degree=sh_deg, bg_color=bg,
                        cfg=cfg, alive=alive,
                        convert_shs_outside=shs,
                        compute_cov3d_outside=cov,
                    ).image
                    img = jnp.clip(img, 0.0, 1.0)
                    return None, (
                        jnp.mean(jnp.abs(img - gt)),
                        psnr_fn(img, gt).mean(),
                    )

                _, (l1s, ps) = jax.lax.scan(body, None, idxs)
                return l1s, ps

            self._render_cache[key] = _eval
        return self._render_cache[key]

    def _report_test(self, iteration: int, first_test: bool = False) -> None:
        """Held-out evaluation (reference: train.py:156-191)."""
        for name, banks in (
            ("test", self.scene.get_test_banks()),
            ("train", self.banks),
        ):
            views = [
                (b, i) for b, bank in enumerate(banks) for i in range(bank.count)
            ]
            if name == "train":
                views = views[:: max(len(views) // 5, 1)][:5]
            if not views:
                continue
            # Metrics: one scanned dispatch per bank.
            l1s, psnrs = [], []
            for b, bank in enumerate(banks):
                idxs = jnp.asarray(
                    [i for bb, i in views if bb == b], jnp.int32
                )
                if idxs.size == 0:
                    continue
                bl1, bps = self._eval_bank_fn(bank)(
                    self.state.params, self.state.aux.alive, bank, idxs,
                    self.background,
                )
                l1s += [float(v) for v in np.asarray(bl1)]
                psnrs += [float(v) for v in np.asarray(bps)]
            # TB images: first-5 renders, GT once at the first test
            # iteration (reference: train.py:176-179).
            if self.tb is not None:
                for b, i in views[:5]:
                    bank = banks[b]
                    cam, gt = bank.pick(jnp.int32(i))
                    img = jnp.clip(self.render_view(cam), 0.0, 1.0)
                    self.tb.add_images(
                        f"{name}_view_{b}_{i}/render",
                        np.asarray(img)[None],
                        global_step=iteration,
                    )
                    if first_test:
                        self.tb.add_images(
                            f"{name}_view_{b}_{i}/ground_truth",
                            np.asarray(jnp.clip(gt, 0.0, 1.0))[None],
                            global_step=iteration,
                        )
            l1 = float(np.mean(l1s))
            ps = float(np.mean(psnrs))
            print(
                f"\n[ITER {iteration}] Evaluating {name}: L1 {l1:.6f} PSNR {ps:.3f}"
            )
            if self.tb is not None:
                self.tb.add_scalar(f"{name}/loss_viewpoint - l1_loss", l1, iteration)
                self.tb.add_scalar(f"{name}/loss_viewpoint - psnr", ps, iteration)
        if self.tb is not None:
            # Opacity histogram over live Gaussians + total points
            # (reference: train.py:188-189).
            alive = np.asarray(self.state.aux.alive)
            opac = np.asarray(self.state.params.get_opacity()).reshape(-1)
            self.tb.add_histogram(
                "scene/opacity_histogram", opac[alive], iteration
            )
            self.tb.add_scalar("total_points", self.n_alive(), iteration)

    def _poll_gui(self, iteration: int, total_iters: int) -> None:
        """Viewer polling (reference: train.py:52-66)."""
        gui = self.gui
        if gui is None:
            return
        if gui.conn is None:
            gui.try_connect()
        while gui.conn is not None:
            try:
                image_bytes = None
                req = gui.receive()
                if req.camera is not None:
                    # GUI frames are 8-bit display output — the bf16
                    # fast-forward is indistinguishable there.
                    img = self.render_view(
                        req.camera,
                        req.scaling_modifier,
                        shs_python=req.do_shs_python,
                        cov3d_python=req.do_rot_scale_python,
                        fast=True,
                    )
                    image_bytes = gui.image_to_bytes(img)
                gui.send(image_bytes, self.model_cfg.source_path)
                if req.do_training and (
                    iteration < total_iters or not req.keep_alive
                ):
                    break
            except Exception:
                gui.drop()
