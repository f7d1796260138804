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
    path: str, state: TrainState, active_sh_degree: int, spatial_lr_scale: float
) -> None:
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
    np.savez(path, **arrays)


def load_checkpoint(path: str) -> tuple[TrainState, int, float]:
    """Returns (state, active_sh_degree, spatial_lr_scale)."""
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
    return state, int(z["meta.active_sh_degree"]), float(z["meta.spatial_lr_scale"])
