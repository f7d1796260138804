"""A/B the fwd kernel's output path: shipping vs no-transpose vs no-out."""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from gsjax.utils.general import enable_compile_cache
enable_compile_cache()
from gsjax.config import RasterConfig
from gsjax.render.binning import bin_gaussians, num_tiles
from gsjax.render.common import build_inst_data, ROWS, T_EPS
from gsjax.render.composite import pack_fields
from gsjax.render.common import chunk_forward, power_basis, tile_pixel_coords
from gsjax.render.pallas_kernels import _chunk_range, _lane_mask
from gsjax.render.preprocess import preprocess
from gsjax.synthetic import look_at_origin_camera, random_scene

WIDTH, HEIGHT, N = 1920, 1080, 500_000
TILE_W = TILE_H = 32

def _fwd_kernel_var(tile_start_ref, inst_hbm, fused_hbm, inst_vmem, sems,
                    out_vmem, out_sems, *, tiles_x, variant):
    chunk = 128
    t = pl.program_id(0)
    last_t = pl.num_programs(0) - 1
    i0 = tile_start_ref[t]
    i1 = tile_start_ref[t + 1]
    c0, n = _chunk_range(i0, i1, chunk)
    pix = TILE_W * TILE_H
    px, py = tile_pixel_coords(t, tiles_x, TILE_W, TILE_H)
    pbase = power_basis(px, py)
    nbuf = inst_vmem.shape[0]

    def get_dma(slot, j):
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds((c0 + j) * chunk, chunk)],
            inst_vmem.at[slot], sems.at[slot])

    for k in range(nbuf - 1):
        @pl.when(k < n)
        def _(k=k):
            get_dma(k, k).start()

    def body(j, carry):
        slot = j % nbuf
        @pl.when(j + nbuf - 1 < n)
        def _():
            get_dma((j + nbuf - 1) % nbuf, j + nbuf - 1).start()
        get_dma(slot, j).wait()
        mask = _lane_mask(c0, j, i0, i1, chunk)
        t_in, done_in, alldone, acc = carry
        def compute(op):
            t_c, done_c, acc_c = op
            inst = inst_vmem[slot]
            t_out, done_out, contrib = chunk_forward(
                inst, px, py, t_c, done_c, mask, pbasis=pbase)
            return (t_out, done_out, jnp.min(done_out) >= 0.5, acc_c + contrib)
        def skip(op):
            t_c, done_c, acc_c = op
            return t_c, done_c, jnp.bool_(True), acc_c
        return lax.cond(alldone, skip, compute, (t_in, done_in, acc))

    init = (jnp.ones((pix, 1), jnp.float32), jnp.zeros((pix, 1), jnp.float32),
            jnp.bool_(False), jnp.zeros((pix, 3), jnp.float32))
    t_fin, _, _, acc = lax.fori_loop(0, n, body, init)

    slot = t % 2
    def out_dma(slot, tile):
        return pltpu.make_async_copy(
            out_vmem.at[slot], fused_hbm.at[tile], out_sems.at[slot])
    @pl.when(t >= 2)
    def _():
        out_dma(slot, t).wait()
    if variant == "ship":
        out_vmem[slot, 0:3, :] = acc.T
        out_vmem[slot, 3:4, :] = t_fin.T
    elif variant == "notrans":
        # consume acc/t_fin without the transpose (scalar reduce to 1 lane)
        out_vmem[slot, 0:1, 0:1] = jnp.sum(acc).reshape(1, 1) + \
            jnp.sum(t_fin).reshape(1, 1)
    out_dma(slot, t).start()
    @pl.when(t == last_t)
    def _():
        out_dma(slot, t).wait()
        @pl.when(t >= 1)
        def _():
            out_dma((t + 1) % 2, t).wait()

@functools.partial(jax.jit, static_argnames=("n_tiles", "tiles_x", "variant"))
def run(inst_data, tile_start, *, n_tiles, tiles_x, variant):
    pix = TILE_W * TILE_H
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        scratch_shapes=[
            pltpu.VMEM((4, ROWS, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((2, 8, pix), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ])
    kernel = functools.partial(_fwd_kernel_var, tiles_x=tiles_x, variant=variant)
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((n_tiles, 8, pix), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",), has_side_effects=True),
    )(tile_start, inst_data)[0]

def timeit(name, fn, *args):
    out = fn(*args)
    _ = np.asarray(jax.device_get(out.ravel()[:1]))
    t0 = time.perf_counter()
    for _ in range(20):
        out = fn(*args)
    _ = np.asarray(jax.device_get(out.ravel()[:1]))
    print(f"{name:24s} {(time.perf_counter()-t0)/20*1000:8.3f} ms", flush=True)

params, aux = random_scene(N, capacity=N, sh_degree=3, seed=0, spread=2.5,
                           scale_range=(0.004, 0.03))
camera = look_at_origin_camera(width=WIDTH, height=HEIGHT)
cfg = RasterConfig(tile_w=TILE_W, tile_h=TILE_H, max_instances=1_179_648,
                   max_rows=524_288)
offset = jnp.zeros((N, 2), jnp.float32)
proj = jax.jit(lambda p, off: preprocess(
    xyz=p.xyz, sh=p.get_features(), opacity=p.get_opacity(),
    scaling=p.get_scaling(), rotation=p.rotation, camera=camera,
    active_sh_degree=3, mean2d_offset=off, alive=aux.alive))(params, offset)
binning = jax.jit(lambda mp, d, e, c, q: bin_gaussians(
    mp, d, e, c, q, HEIGHT, WIDTH, cfg))(
    proj.mean_pix, proj.depth, proj.ext, proj.conic, proj.qmax)
inst = jax.jit(lambda mp, c, rgb, op, so, perm: build_inst_data(
    jnp.take(pack_fields(mp, c, rgb, op), perm, axis=0), so))(
    proj.mean_pix, proj.conic, proj.rgb, proj.opacity,
    binning.sorted_owner, binning.perm)
tiles_x, tiles_y = num_tiles(HEIGHT, WIDTH, TILE_W, TILE_H)
for v in ("ship", "notrans"):
    timeit(v, lambda i, ts, v=v: run(i, ts, n_tiles=tiles_x * tiles_y,
                                     tiles_x=tiles_x, variant=v),
           inst, binning.tile_start)
