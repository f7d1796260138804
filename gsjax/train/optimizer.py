"""Adam with per-parameter-group learning rates and surgery-friendly state.

Matches the reference's torch.optim.Adam(eps=1e-15) setup with six groups at
different LRs and a per-step xyz LR from the exponential schedule
(reference: scene/gaussian_model.py:149-175). The first/second moments are
plain pytrees mirroring GaussianParams, so densification can gather/zero
them alongside the parameters exactly as the reference's optimizer-state
surgery does (reference: scene/gaussian_model.py:258-327).

The bias-correction step count is global (shared across slots) — identical
behavior to torch, where rows appended to a tensor inherit the tensor's
step count with zeroed moments.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp

from gsjax.config import OptimizationConfig
from gsjax.model import GaussianParams
from gsjax.train.schedule import expon_lr

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15


@flax.struct.dataclass
class AdamState:
    count: jnp.ndarray  # [] int32
    mu: Any  # pytree like params
    nu: Any


def adam_init(params) -> AdamState:
    return AdamState(
        count=jnp.zeros((), jnp.int32),
        mu=jax.tree.map(jnp.zeros_like, params),
        nu=jax.tree.map(jnp.zeros_like, params),
    )


def adam_update(
    grads, state: AdamState, params, lr_tree
) -> tuple[Any, AdamState]:
    """One Adam step. lr_tree: pytree of scalar LRs matching params' structure."""
    count = state.count + 1
    c = count.astype(jnp.float32)
    bc1 = 1.0 - BETA1**c
    bc2 = 1.0 - BETA2**c

    mu = jax.tree.map(lambda m, g: BETA1 * m + (1.0 - BETA1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: BETA2 * v + (1.0 - BETA2) * g * g, state.nu, grads)

    def step(p, m, v, lr):
        mhat = m / bc1
        vhat = v / bc2
        return p - lr * mhat / (jnp.sqrt(vhat) + EPS)

    new_params = jax.tree.map(step, params, mu, nu, lr_tree)
    return new_params, AdamState(count=count, mu=mu, nu=nu)


def make_lr_tree(
    cfg: OptimizationConfig, spatial_lr_scale: float, step: jnp.ndarray
) -> GaussianParams:
    """Per-group LRs as a GaussianParams-shaped pytree of scalars
    (reference: scene/gaussian_model.py:154-167, train.py:69)."""
    xyz_lr = expon_lr(
        step,
        lr_init=cfg.position_lr_init * spatial_lr_scale,
        lr_final=cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=cfg.position_lr_delay_mult,
        max_steps=cfg.position_lr_max_steps,
    )
    return GaussianParams(
        xyz=xyz_lr,
        features_dc=jnp.float32(cfg.feature_lr),
        features_rest=jnp.float32(cfg.feature_lr / 20.0),
        scaling=jnp.float32(cfg.scaling_lr),
        rotation=jnp.float32(cfg.rotation_lr),
        opacity=jnp.float32(cfg.opacity_lr),
    )
