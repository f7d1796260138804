"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware, per SURVEY.md section 4's multi-host test plan.

NOTE: a sitecustomize in this image force-registers the TPU platform and
overrides the JAX_PLATFORMS env var, so the platform must be pinned through
jax.config AFTER importing jax (env setdefault alone is silently ignored).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compilation cache: XLA compiles dominate test wall-clock on the
# small CI CPU; cache them across runs.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", (
    "tests must run on CPU; got " + jax.default_backend()
)
