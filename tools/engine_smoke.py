"""Compile-and-run smoke test for the fused row engine on the real TPU.

Runs BEFORE the long unattended quality run: a fresh Pallas kernel's
Mosaic lowering can fail in ways interpret-mode tests cannot see. On any
failure this drops /root/repo/.disable_row_engine so binning falls back to
the proven rank-kernel path, and the quality run proceeds regardless.

Also cross-checks the engine layout against the fallback on-device (exact
integer equality of tile_start / sorted_owner / counts).
"""

from __future__ import annotations

import sys
import traceback

sys.path.insert(0, "/root/repo")

SENTINEL = "/root/repo/.disable_row_engine"


def main() -> int:
    try:
        import jax
        import jax.numpy as jnp
        import numpy as np

        from gsjax.utils.general import enable_compile_cache

        enable_compile_cache()
        from gsjax.config import RasterConfig
        from gsjax.render import binning as B
        from gsjax.render.preprocess import preprocess
        from gsjax.synthetic import look_at_origin_camera, random_scene

        assert B.ROW_ENGINE, "sentinel already present; remove to retest"
        params, aux = random_scene(
            20_000, capacity=20_000, sh_degree=2, seed=1, spread=2.0,
            scale_range=(0.005, 0.05),
        )
        camera = look_at_origin_camera(width=640, height=360)
        proj = jax.jit(lambda p: preprocess(
            xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
            scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
            active_sh_degree=2, alive=aux.alive))(params)
        cfg = RasterConfig(tile_w=32, tile_h=32, max_instances=1 << 17,
                           max_rows=1 << 16)
        args = (proj.mean_pix, proj.depth, proj.ext, proj.conic, proj.qmax)

        def run(packed):
            return jax.jit(lambda *a: B.bin_gaussians(
                *a, 360, 640, cfg, packed_paths=packed))(*args)

        eng = run(None)  # engine path (ROW_ENGINE on, bits fit)
        ref = run(False)  # gather fallback
        for name in ("tile_start", "sorted_owner", "sorted_slot",
                     "gm_start", "num_instances", "num_rows"):
            a = np.asarray(getattr(eng, name))
            b = np.asarray(getattr(ref, name))
            np.testing.assert_array_equal(a, b, err_msg=name)
        print(f"row engine OK on {jax.default_backend()}: "
              f"{int(eng.num_instances)} pairs, layout == fallback",
              flush=True)
        return 0
    except Exception:
        traceback.print_exc()
        with open(SENTINEL, "w") as f:
            f.write("row engine failed its TPU smoke test; see "
                    "artifacts/tpu_queue_r5/engine_smoke.log\n")
        print(f"row engine DISABLED via {SENTINEL}", flush=True)
        return 0  # queue proceeds either way


if __name__ == "__main__":
    raise SystemExit(main())
