"""Full-training-state checkpoints.

The gsjax analog of torch.save((gaussians.capture(), iteration))
(reference: train.py:130-132; scene/gaussian_model.py:61-93): one .npz with
every leaf of the TrainState (params, Adam moments + count, densification
stats, alive mask, step) plus the scalars the reference captures
(active_sh_degree, spatial_lr_scale).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from gsjax.model import GaussianAux, GaussianParams
from gsjax.train.optimizer import AdamState
from gsjax.train.step import TrainState

_PARAM_FIELDS = ("xyz", "features_dc", "features_rest", "scaling", "rotation", "opacity")


def save_checkpoint(
    path: str,
    state: TrainState,
    active_sh_degree: int,
    spatial_lr_scale: float,
    extra: dict | None = None,
) -> None:
    """`extra` is a flat dict of numpy arrays persisted under "extra.<k>" —
    the Trainer stores its host-side RNG/stack snapshot there so a restored
    run reproduces an uninterrupted one bit-for-bit (exact resume parity
    needs the densify split key, the background RNG, and the mid-epoch
    camera stack, none of which live in the device TrainState)."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    arrays = {"step": np.asarray(state.step)}
    for f in _PARAM_FIELDS:
        arrays[f"params.{f}"] = np.asarray(getattr(state.params, f))
        arrays[f"mu.{f}"] = np.asarray(getattr(state.opt.mu, f))
        arrays[f"nu.{f}"] = np.asarray(getattr(state.opt.nu, f))
    arrays["opt.count"] = np.asarray(state.opt.count)
    arrays["aux.alive"] = np.asarray(state.aux.alive)
    arrays["aux.max_radii2d"] = np.asarray(state.aux.max_radii2d)
    arrays["aux.xyz_grad_accum"] = np.asarray(state.aux.xyz_grad_accum)
    arrays["aux.denom"] = np.asarray(state.aux.denom)
    arrays["meta.active_sh_degree"] = np.asarray(active_sh_degree)
    arrays["meta.spatial_lr_scale"] = np.asarray(spatial_lr_scale)
    for k, v in (extra or {}).items():
        arrays[f"extra.{k}"] = np.asarray(v)
    # Write-then-rename: a SIGTERM mid-save (wall-clock-boxed runs are
    # killed at the box) must never leave a truncated archive where the
    # auto-resume scan will pick it up. os.replace is atomic on POSIX.
    if not path.endswith(".npz"):
        path = path + ".npz"  # np.savez appends it; keep tmp/final in sync
    tmp = path + ".tmp.npz"
    try:
        with open(tmp, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def save_checkpoint_orbax(
    path: str,
    state: TrainState,
    active_sh_degree: int,
    spatial_lr_scale: float,
    extra: dict | None = None,
) -> None:
    """Orbax variant for sharded/multi-host checkpoints (SURVEY.md §5.4):
    each host writes only its addressable shards; restore re-shards to the
    current mesh. The .npz path above stays the single-host default; the
    Trainer selects this one with use_orbax=True (--orbax CLI flag)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = {
        "state": state,
        "meta": {
            "active_sh_degree": np.int32(active_sh_degree),
            "spatial_lr_scale": np.float32(spatial_lr_scale),
        },
        "extra": {k: np.asarray(v) for k, v in (extra or {}).items()},
    }
    ckptr.save(os.path.abspath(path), payload, force=True)
    ckptr.wait_until_finished()


def load_checkpoint_orbax(path: str) -> tuple[TrainState, int, float, dict]:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = ckptr.restore(os.path.abspath(path))
    s = payload["state"]

    def params(d):
        return GaussianParams(**{f: jnp.asarray(d[f]) for f in _PARAM_FIELDS})

    state = TrainState(
        params=params(s["params"]),
        opt=AdamState(
            count=jnp.asarray(s["opt"]["count"]),
            mu=params(s["opt"]["mu"]),
            nu=params(s["opt"]["nu"]),
        ),
        aux=GaussianAux(**{k: jnp.asarray(v) for k, v in s["aux"].items()}),
        step=jnp.asarray(s["step"]),
    )
    meta = payload["meta"]
    return (
        state,
        int(meta["active_sh_degree"]),
        float(meta["spatial_lr_scale"]),
        dict(payload.get("extra") or {}),
    )


def load_checkpoint(
    path: str,
) -> tuple[TrainState, int, float] | tuple[TrainState, int, float, dict]:
    """Returns (state, active_sh_degree, spatial_lr_scale). Use
    load_checkpoint_extra for the host RNG/stack snapshot as well."""
    state, sh, lr, _ = load_checkpoint_extra(path)
    return state, sh, lr


def load_checkpoint_extra(path: str) -> tuple[TrainState, int, float, dict]:
    """Returns (state, active_sh_degree, spatial_lr_scale, extra) where
    extra holds whatever dict was passed to save_checkpoint (empty for
    checkpoints written before round 4)."""
    z = np.load(path)

    def tree(prefix):
        return GaussianParams(
            **{f: jnp.asarray(z[f"{prefix}.{f}"]) for f in _PARAM_FIELDS}
        )

    state = TrainState(
        params=tree("params"),
        opt=AdamState(
            count=jnp.asarray(z["opt.count"]), mu=tree("mu"), nu=tree("nu")
        ),
        aux=GaussianAux(
            alive=jnp.asarray(z["aux.alive"]),
            max_radii2d=jnp.asarray(z["aux.max_radii2d"]),
            xyz_grad_accum=jnp.asarray(z["aux.xyz_grad_accum"]),
            denom=jnp.asarray(z["aux.denom"]),
        ),
        step=jnp.asarray(z["step"]),
    )
    extra = {
        k[len("extra."):]: z[k] for k in z.files if k.startswith("extra.")
    }
    return (
        state,
        int(z["meta.active_sh_degree"]),
        float(z["meta.spatial_lr_scale"]),
        extra,
    )
