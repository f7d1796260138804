import sys; sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp
import numpy as np
from gsjax.render.pallas_kernels import rank_prefix_pallas
print(jax.devices())
start = jnp.array(np.sort(np.random.randint(0, 5000, size=2000)), jnp.int32)
delta = jnp.ones(2000, jnp.uint32)
out = rank_prefix_pallas(start, delta, budget=5120)
out.block_until_ready()
print("OK", out[:5])
