"""Drive gsjax end-to-end on the real TPU through the public API:
direct render probes (oracle parity, overflow report, alive mask), then the
train -> render -> metrics CLI pipeline on a tiny synthetic Blender dataset.
The /verify skill's build-and-drive recipe as a checked-in tool
(see .claude/skills/verify/SKILL.md)."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gsjax.utils.general import enable_compile_cache

enable_compile_cache()  # minutes-per-compile over the TPU tunnel

from gsjax.config import RasterConfig
from gsjax.render.api import render, render_oracle
from tests.scene_utils import look_at_origin_camera, random_scene

print(f"backend: {jax.default_backend()}", flush=True)

W, H = 128, 96
BG = jnp.array([0.1, 0.15, 0.2])
params, aux = random_scene(500, seed=0)
camera = look_at_origin_camera(W, H)
cfg = RasterConfig(max_instances=1 << 14, max_rows=1 << 14, interpret=False)

out = render(params, camera, active_sh_degree=3, bg_color=BG, cfg=cfg, alive=aux.alive)
img = np.asarray(out.image)
assert img.shape == (3, H, W)
oracle = np.asarray(
    render_oracle(params, camera, active_sh_degree=3, bg_color=BG, alive=aux.alive)
)
err = np.abs(img - oracle).max()
print(f"render ok on TPU: mean={img.mean():.4f} std={img.std():.4f} "
      f"max|err vs oracle|={err:.5f}", flush=True)
assert err < 2e-3, err
assert img.std() > 0.01

fwd = jax.jit(
    lambda p: render(
        p, camera, active_sh_degree=3, bg_color=BG, cfg=cfg, alive=aux.alive
    ).image
)
x = fwd(params)
_ = np.asarray(x.ravel()[:1])
t0 = time.perf_counter()
for _ in range(20):
    x = fwd(params)
_ = np.asarray(x.ravel()[:1])
print(f"jitted forward: {(time.perf_counter() - t0) / 20 * 1000:.1f} ms/frame",
      flush=True)

tiny = RasterConfig(max_instances=128, max_rows=128, interpret=False)
out_tiny = render(params, camera, active_sh_degree=3, bg_color=BG, cfg=tiny,
                  alive=aux.alive)
print(f"overflow probe: num_instances={int(out_tiny.num_instances)} (budget 128)",
      flush=True)
assert int(out_tiny.num_instances) > 128

dead = jnp.zeros(params.capacity, dtype=bool)
out_dead = render(params, camera, active_sh_degree=3, bg_color=BG, cfg=cfg,
                  alive=dead)
bgimg = np.broadcast_to(np.asarray(BG)[:, None, None], (3, H, W))
np.testing.assert_allclose(np.asarray(out_dead.image), bgimg, atol=1e-6)
print("alive-mask probe ok (pure background)", flush=True)

# ---- CLI pipeline on a tiny Blender dataset ---------------------------------
from PIL import Image

from gsjax.data.ply import store_points_ply

root = "/tmp/gsjax_verify_scene"
model_path = "/tmp/gsjax_verify_model"
os.system(f"rm -rf {root} {model_path}")
rng = np.random.default_rng(0)


def make_split(name, n, offset):
    frames = []
    os.makedirs(f"{root}/{name}", exist_ok=True)
    for i in range(n):
        angle = (i + offset) * (2 * np.pi / 10)
        pos = 4.0 * np.array([np.sin(angle), 0.0, np.cos(angle)])
        fwd_v = -pos / np.linalg.norm(pos)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(fwd_v, up)
        right /= np.linalg.norm(right)
        up2 = np.cross(right, fwd_v)
        c2w = np.eye(4)
        c2w[:3, 0] = right
        c2w[:3, 1] = up2
        c2w[:3, 2] = -fwd_v
        c2w[:3, 3] = pos
        im = np.zeros((64, 64, 4), np.uint8)
        yy, xx = np.mgrid[:64, :64]
        r2 = (yy - 32) ** 2 + (xx - 32) ** 2
        im[r2 < (12 + 2 * np.sin(angle)) ** 2] = [255, 255, 255, 255]
        im[..., 3] = 255
        Image.fromarray(im).save(f"{root}/{name}/r_{i}.png")
        frames.append({"file_path": f"./{name}/r_{i}",
                       "transform_matrix": c2w.tolist()})
    with open(f"{root}/transforms_{name}.json", "w") as f:
        json.dump({"camera_angle_x": 0.9, "frames": frames}, f)


make_split("train", 8, 0)
make_split("test", 2, 0.5)
pts = rng.uniform(-0.5, 0.5, (300, 3))
store_points_ply(f"{root}/points3d.ply", pts, rng.uniform(0, 255, (300, 3)))

from gsjax.cli import metrics as metrics_cli
from gsjax.cli import render as render_cli
from gsjax.cli import train as train_cli

t0 = time.perf_counter()
train_cli.main([
    "-s", root, "-m", model_path, "--eval",
    "--iterations", "400", "--save_iterations", "400",
    "--test_iterations", "400", "--quiet",
])
print(f"train CLI: {time.perf_counter() - t0:.1f} s", flush=True)
render_cli.main(["-m", model_path, "--iteration", "400", "--quiet"])
metrics_cli.main(["-m", model_path])
with open(f"{model_path}/results.json") as f:
    results = json.load(f)
psnr_val = results["ours_400"]["PSNR"]
print(f"test PSNR after 400 iters: {psnr_val:.2f} dB", flush=True)
assert psnr_val > 15.0, f"PSNR too low: {psnr_val}"
print("VERIFY OK", flush=True)
