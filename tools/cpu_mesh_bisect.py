"""Bisect the sharded-step structural slowdown on CPU: time the forward
objective and the full vjp separately for the plain and (1,1)-mesh paths."""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_platforms", "cpu")

from jax import lax
from jax.sharding import PartitionSpec as P

from gsjax.config import OptimizationConfig, RasterConfig
from gsjax.parallel.mesh import make_mesh
from gsjax.parallel import step as pstep
from gsjax.render.api import render
from gsjax.render.preprocess import preprocess
from gsjax.synthetic import look_at_origin_camera, random_scene
from gsjax.train.loss import l1_loss, ssim

W, H = 512, 256
N = 20_000
ITERS = 6


def fence(x):
    _ = np.asarray(jax.device_get(jax.tree.leaves(x)[0].ravel()[:1]))


def timeit(fn, *args):
    out = fn(*args)
    fence(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(*args)
    fence(out)
    return (time.perf_counter() - t0) / ITERS * 1e3


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
    opt_cfg = OptimizationConfig()
    gt = jnp.zeros((3, H, W), jnp.float32)
    bg = jnp.zeros(3, jnp.float32)
    alive = aux.alive
    lam = opt_cfg.lambda_dssim

    def plain_loss(params, offset):
        out = render(
            params, camera, active_sh_degree=2, bg_color=bg, cfg=cfg,
            alive=alive, mean2d_offset=offset,
        )
        l1 = l1_loss(out.image, gt)
        return (1.0 - lam) * l1 + lam * (1.0 - ssim(out.image, gt))

    offset = jnp.zeros((params.capacity, 2), jnp.float32)
    t_fwd_plain = timeit(jax.jit(plain_loss), params, offset)
    print(f"plain fwd-only:   {t_fwd_plain:.0f} ms", flush=True)

    g_plain = jax.jit(jax.grad(plain_loss, argnums=(0, 1)))
    t_g_plain = timeit(lambda p, o: g_plain(p, o)[1], params, offset)
    print(f"plain fwd+bwd:    {t_g_plain:.0f} ms", flush=True)

    # --- sharded twins -----------------------------------------------------
    mesh = make_mesh(devices=jax.devices()[:1], data=1, tile=1)
    n_tile = 1
    ts = cfg.th
    rows = pstep.slab_rows(H, n_tile, ts)

    def make_body(grad: bool):
        def body(params, alive, views, projs, centers, tanx, tany, gts, bgv):
            from gsjax.core.cameras import Camera

            camera_l = Camera(
                view=views[0], full_proj=projs[0], cam_center=centers[0],
                tan_fovx=tanx[0], tan_fovy=tany[0], width=W, height=H,
            )
            gt_img = gts[0]
            offset = jnp.zeros((params.capacity, 2), jnp.float32)

            def pre_fn(params, offset):
                proj = preprocess(
                    xyz=params.xyz, sh=params.get_features(),
                    opacity=params.get_opacity(),
                    scaling=params.get_scaling(), rotation=params.rotation,
                    camera=camera_l, active_sh_degree=2,
                    mean2d_offset=offset, alive=alive,
                )
                return (proj.mean_pix, proj.conic, proj.rgb, proj.opacity), proj

            local = pstep.make_sharded_train_step  # noqa: F841 (doc)
            if not grad:
                fields, proj = pre_fn(params, offset)
                obj, _ = _local_obj(fields, proj, gt_img, bgv)
                return obj

            fields, pre_pull, proj = jax.vjp(pre_fn, params, offset, has_aux=True)
            obj, slab_pull, _ = jax.vjp(
                lambda *f: _local_obj(f, proj, gt_img, bgv), *fields,
                has_aux=True,
            )
            d_fields = slab_pull(jnp.float32(1.0))
            d_fields = jax.tree.map(lambda x: lax.psum(x, "tile"), d_fields)
            g_params, g_offset = pre_pull(d_fields)
            return g_offset

        def _local_obj(fields, proj, gt_img, bgv):
            mean_pix, conic, rgb, opacity = fields
            tile_idx = lax.axis_index("tile")
            slab_px = rows * ts
            py0 = (tile_idx * slab_px).astype(jnp.float32)
            from gsjax.parallel.render import composite_slab

            color, t, ninst = composite_slab(
                mean_pix, conic, rgb, opacity, proj.depth, proj.ext,
                proj.qmax, height=H, width=W, cfg=cfg, py0=py0, rows=rows,
            )
            img = color[:, :, :W] + t[None, :, :W] * bgv[:, None, None]
            row_ids = tile_idx * slab_px + jnp.arange(slab_px)
            row_ok = (row_ids < H).astype(jnp.float32)
            img = img * row_ok[None, :, None]
            gt_pad = jnp.pad(
                gt_img, ((0, 0), (5, n_tile * slab_px + 5 - H), (0, 0))
            )
            gt_ext = lax.dynamic_slice_in_dim(
                gt_pad, tile_idx * slab_px, slab_px + 10, axis=1
            )
            up = jnp.zeros_like(img[:, :5, :])
            img_ext = jnp.concatenate([up, img, up], axis=1)
            l1_sum = jnp.sum(jnp.abs(img - gt_ext[:, 5:-5, :]))
            from gsjax.train.loss import ssim_map

            smap = ssim_map(img_ext, gt_ext, pad_h=False)
            ssim_sum = jnp.sum(smap * row_ok[None, :, None])
            obj = ((1.0 - lam) * l1_sum - lam * ssim_sum) / (3.0 * H * W)
            return obj, ninst

        return body

    sargs = (
        params, alive, camera.view[None], camera.full_proj[None],
        camera.cam_center[None], camera.tan_fovx[None],
        camera.tan_fovy[None], gt[None], bg,
    )
    specs = (P(),) * 9

    fwd_sh = jax.jit(jax.shard_map(
        make_body(False), mesh=mesh, in_specs=specs, out_specs=P(),
        check_vma=False,
    ))
    t_fwd_sh = timeit(fwd_sh, *sargs)
    print(f"sharded fwd-only: {t_fwd_sh:.0f} ms ({t_fwd_sh / t_fwd_plain:.2f}x)", flush=True)

    g_sh = jax.jit(jax.shard_map(
        make_body(True), mesh=mesh, in_specs=specs, out_specs=P(),
        check_vma=False,
    ))
    t_g_sh = timeit(g_sh, *sargs)
    print(f"sharded fwd+bwd:  {t_g_sh:.0f} ms ({t_g_sh / t_g_plain:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
