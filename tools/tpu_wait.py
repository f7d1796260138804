"""Long-poll the TPU tunnel: probe every 5 min until alive, then touch
/tmp/tpu_alive and exit 0. Gives up after --hours (default 6)."""
import subprocess, sys, time, os

hours = float(sys.argv[1]) if len(sys.argv) > 1 else 6.0
deadline = time.time() + hours * 3600
code = (
    "import time,jax,jax.numpy as jnp,numpy as np;"
    "t0=time.time();x=(jnp.ones((8,128))@jnp.ones((128,8)));"
    "print('backend',jax.default_backend(),'ok in %.1fs'%(time.time()-t0),flush=True)"
)
attempt = 0
while time.time() < deadline:
    attempt += 1
    try:
        rc = subprocess.run([sys.executable, "-c", code], timeout=300,
                            cwd="/root/repo").returncode
    except subprocess.TimeoutExpired:
        rc = -1
    print(f"[tpu_wait] attempt {attempt}: rc={rc}", flush=True)
    if rc == 0:
        open("/tmp/tpu_alive", "w").write(str(time.time()))
        print("[tpu_wait] TPU ALIVE", flush=True)
        sys.exit(0)
    time.sleep(300)
print("[tpu_wait] gave up", flush=True)
sys.exit(1)
