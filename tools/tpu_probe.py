"""One-op TPU aliveness probe with retry/backoff (tunnel recovery aid)."""
import sys, time

def try_once(i):
    import subprocess
    code = (
        "import time,jax,jax.numpy as jnp,numpy as np;"
        "t0=time.time();x=(jnp.ones((8,128))@jnp.ones((128,8)));"
        "print('backend',jax.default_backend(),'ok',float(np.asarray(x.ravel()[0])),'in %.1fs'%(time.time()-t0),flush=True)"
    )
    return subprocess.run([sys.executable, "-c", code], timeout=420, cwd="/root/repo").returncode

for i in range(6):
    try:
        rc = try_once(i)
    except Exception as e:
        print(f"attempt {i}: {type(e).__name__}", flush=True)
        rc = -1
    if rc == 0:
        print("PROBE OK", flush=True)
        sys.exit(0)
    print(f"attempt {i} failed rc={rc}; sleeping 120s", flush=True)
    time.sleep(120)
print("PROBE FAILED after 6 attempts", flush=True)
sys.exit(1)
