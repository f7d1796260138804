import sys, time
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from gsjax.utils.general import enable_compile_cache
enable_compile_cache()
from gsjax.config import RasterConfig
from gsjax.render.binning import bin_gaussians
from gsjax.render.preprocess import preprocess
from gsjax.synthetic import look_at_origin_camera, random_scene

WIDTH, HEIGHT, N = 1920, 1080, 500_000
params, aux = random_scene(N, capacity=N, sh_degree=3, seed=0, spread=2.5, scale_range=(0.004, 0.03))
camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
proj = jax.jit(lambda p: preprocess(
    xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
    scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
    active_sh_degree=3, scaling_modifier=1.0,
    mean2d_offset=jnp.zeros((N, 2), jnp.float32), alive=aux.alive,
))(params)

def run(packed):
    cfg = RasterConfig(tile_w=32, tile_h=32, max_instances=1_179_648,
                       max_rows=524_288)
    f = jax.jit(lambda mp, d, e, c, q: bin_gaussians(
        mp, d, e, c, q, height=HEIGHT, width=WIDTH, cfg=cfg, packed_paths=packed))
    out = f(proj.mean_pix, proj.depth, proj.ext, proj.conic, proj.qmax)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(30):
        out = f(proj.mean_pix, proj.depth, proj.ext, proj.conic, proj.qmax)
    jax.block_until_ready(out)
    print(f"packed={packed}: {(time.perf_counter()-t0)/30*1000:.3f} ms")
    return out

a = run(False)
b = run(None)
leaves_a, leaves_b = jax.tree.leaves(a), jax.tree.leaves(b)
ok = all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(leaves_a, leaves_b))
print("bit-exact:", ok)
