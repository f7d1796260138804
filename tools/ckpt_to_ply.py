"""Export a training checkpoint (.npz / Orbax dir) to the reference PLY.

The trainer only writes point_cloud/iteration_*/point_cloud.ply at
save_iterations; a wall-clock-boxed run's LATEST state lives in its
periodic chkpnt*.npz. This converts one to the standard PLY so the
trained-scene benches (tools/bench_trained.py, profile_stages.py --ply)
measure the newest state.

Usage: python tools/ckpt_to_ply.py <chkpnt.npz> <out_dir>
  -> <out_dir>/point_cloud/iteration_<step>/point_cloud.ply
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from gsjax.data.ply import save_gaussian_ply
    from gsjax.train.checkpoint import load_checkpoint

    ckpt, out_dir = sys.argv[1], sys.argv[2]
    state, sh_deg, _ = load_checkpoint(ckpt)
    step = int(state.step)
    alive = np.asarray(state.aux.alive)
    path = os.path.join(
        out_dir, "point_cloud", f"iteration_{step}", "point_cloud.ply"
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    save_gaussian_ply(path, state.params, alive=state.aux.alive)
    print(f"wrote {path} ({int(alive.sum())} gaussians, step {step})")


if __name__ == "__main__":
    main()
