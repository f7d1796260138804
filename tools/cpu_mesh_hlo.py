"""Dump compiled-HLO fusion shapes for the sharded grads fn on CPU and
grep the multiply_pad fusions the trace flagged."""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.parallel.mesh import make_mesh
from gsjax.parallel.step import make_sharded_train_step
from gsjax.synthetic import look_at_origin_camera, random_scene

W, H = 512, 256
N = 20_000


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
    mesh = make_mesh(devices=jax.devices()[:1], data=1, tile=1)
    step = make_sharded_train_step(
        mesh, height=H, width=W, active_sh_degree=2,
        opt_cfg=OptimizationConfig(), raster_cfg=cfg, spatial_lr_scale=1.0,
    )
    gt = jnp.zeros((3, H, W), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    sargs = (
        params, aux.alive, camera.view[None], camera.full_proj[None],
        camera.cam_center[None], camera.tan_fovx[None],
        camera.tan_fovy[None], gt[None], bg,
    )
    compiled = jax.jit(step.sharded_grads).lower(*sargs).compile()
    txt = compiled.as_text()
    pat = sys.argv[1] if len(sys.argv) > 1 else "multiply_pad_fusion"
    # Print each flagged fusion's root computation lines.
    for m in re.finditer(rf"%?({pat}[.\d]*) ", txt):
        name = m.group(1)
    # Simpler: print fusion definition headers + their computations.
    lines = txt.splitlines()
    show = False
    depth = 0
    for i, ln in enumerate(lines):
        if re.search(rf"ENTRY|fused_computation", ln):
            show = False
        if re.search(rf"%{pat}", ln) and "= " in ln and "fusion(" in ln:
            print(ln.strip()[:220])
    # Also dump the fused computations named like the pattern.
    for i, ln in enumerate(lines):
        if re.match(rf"%fused_{pat}", ln.strip()):
            print(ln.strip()[:200])


if __name__ == "__main__":
    main()
