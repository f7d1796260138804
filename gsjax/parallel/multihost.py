"""Multi-host process-group initialization.

SURVEY.md §5.8: the TPU-native distributed backend is
jax.distributed.initialize over DCN + XLA collectives over ICI — no NCCL
analog is written; this module is the thin policy layer (when to
initialize, global mesh construction, host-local data sharding helpers).
"""

from __future__ import annotations

import os

import jax


def maybe_init_distributed() -> bool:
    """Initialize the multi-host process group when launched under a
    multi-host coordinator. Safe no-op for single-process runs. Returns
    True when distributed mode is active.

    MUST run before anything touches the XLA backend (jax.devices(),
    any computation) — jax.distributed.initialize refuses afterwards —
    so the decision is driven purely by environment variables:
    COORDINATOR_ADDRESS/NUM_PROCESSES/PROCESS_ID for explicit launches
    (tests/test_multihost.py exercises this across real processes), or
    JAX_COORDINATOR_ADDRESS for environments jax can auto-detect (TPU
    pods, SLURM), where initialize() infers the rest itself."""
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    addr = os.environ.get("COORDINATOR_ADDRESS")
    n = os.environ.get("NUM_PROCESSES")
    pid = os.environ.get("PROCESS_ID")
    if addr and n and pid:
        jax.distributed.initialize(
            coordinator_address=addr,
            num_processes=int(n),
            process_id=int(pid),
        )
        return True
    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        jax.distributed.initialize()
        return True
    return False


def host_local_views(n_total: int) -> range:
    """The slice of camera indices this host loads (host-local data
    loading; cameras are sharded round-robin over processes)."""
    return range(jax.process_index(), n_total, jax.process_count())
