"""Which variant explodes the SSIM backward into O(window) image-rate pad
fusions? Compare compiled-HLO multiply_pad counts for:
  a) plain ssim() objective under jit
  b) ssim_map(pad_h=False) objective under jit (no shard_map)
  c) the same under shard_map (1,1)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from jax import lax
from jax.sharding import PartitionSpec as P

from gsjax.parallel.mesh import make_mesh
from gsjax.train.loss import ssim, ssim_map

H, W = 256, 512
HALO = 5


def count_pads(fn, *args, shmap=None):
    if shmap is not None:
        fn = jax.shard_map(
            fn, mesh=shmap, in_specs=(P(), P()), out_specs=P(),
            check_vma=False,
        )
    txt = jax.jit(fn).lower(*args).compile().as_text()
    fusions = re.findall(r"%(\w*pad\w*fusion[.\d]*) = f32\[([\d,]+)\]", txt)
    big = [f for f in fusions if eval(f[1].replace(",", "*")) > 100_000]
    n_pad_ops = len(re.findall(r" pad\(", txt))
    return len(set(f[0] for f in fusions)), len(big), n_pad_ops


def main() -> None:
    img = jnp.zeros((3, H, W), jnp.float32)
    gt = jnp.zeros((3, H, W), jnp.float32)
    imge = jnp.zeros((3, H + 2 * HALO, W), jnp.float32)
    gte = jnp.zeros((3, H + 2 * HALO, W), jnp.float32)

    def obj_a(img, gt):
        return 1.0 - ssim(img, gt)

    def obj_b(imge, gte):
        return jnp.sum(ssim_map(imge, gte, pad_h=False))

    ga = jax.grad(obj_a)
    gb = jax.grad(obj_b)
    print("a) ssim() grad, jit:            ", count_pads(ga, img, gt))
    print("b) ssim_map(pad_h=F) grad, jit: ", count_pads(gb, imge, gte))

    mesh = make_mesh(devices=jax.devices()[:1], data=1, tile=1)

    def obj_c(imge, gte):
        return jnp.sum(ssim_map(imge, gte, pad_h=False))

    gc = jax.grad(obj_c)
    print("c) same under shard_map (1,1):  ", count_pads(gc, imge, gte, shmap=mesh))

    def obj_d(img, gt):
        return 1.0 - ssim(img, gt)

    gd = jax.grad(obj_d)
    print("d) ssim() grad under shard_map: ", count_pads(gd, img, gt, shmap=mesh))


if __name__ == "__main__":
    main()
