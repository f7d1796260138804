"""Adaptive density control under static shapes.

Functional re-design of the reference's clone/split/prune with optimizer
surgery (reference: scene/gaussian_model.py:349-407, train.py:113-123).
Where the reference reallocates tensors every densification, gsjax keeps
fixed-capacity buffers and compacts with cumsum-scatter — the step compiles
once per capacity.

Semantics mirrored exactly:
* grads = xyz_grad_accum / denom (NaN -> 0).
* clone: grad >= threshold AND max(scale) <= percent_dense * extent; copies
  the raw parameters; cloned slots get ZEROED Adam moments.
* split: grad >= threshold AND max(scale) > percent_dense * extent; N=2
  samples ~ Normal(0, scale) rotated into world space; new scale =
  log(scale / (0.8 * N)); originals removed; zeroed moments.
* final prune: opacity < min_opacity, plus (when max_screen_size is set)
  screen radius and world-size criteria. NOTE the reference resets
  max_radii2D during densification_postfix BEFORE this prune runs
  (scene/gaussian_model.py:347,393-401), so its screen-size test compares
  zeros and never fires there; it's reproduced faithfully (the world-size
  0.1*extent test is the one that bites). Pruning here only clears the
  alive mask — compaction happens on the next densify.
* all densification stats (accum/denom/max_radii2D) reset to zero.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from gsjax.core.transforms import build_rotation
from gsjax.model import (
    DEAD_OPACITY_FILL,
    DEAD_SCALING_FILL,
    GaussianAux,
    GaussianParams,
)
from gsjax.train.optimizer import AdamState

SPLIT_N = 2
SPLIT_SCALE_SHRINK = 0.8 * SPLIT_N  # reference: scene/gaussian_model.py:363


@flax.struct.dataclass
class DensifyStats:
    """Diagnostics from one densify step (all [] int32)."""

    n_alive: jnp.ndarray
    n_cloned: jnp.ndarray
    n_split: jnp.ndarray
    n_pruned: jnp.ndarray
    n_dropped: jnp.ndarray  # candidates lost to capacity overflow


def add_densification_stats(
    aux: GaussianAux, radii: jnp.ndarray, screen_grad: jnp.ndarray
) -> GaussianAux:
    """Per-iteration stat accumulation (reference: train.py:115-116,
    scene/gaussian_model.py:405-407). screen_grad: [C,2] NDC gradient."""
    visible = radii > 0
    norm = jnp.linalg.norm(screen_grad, axis=-1)
    return aux.replace(
        max_radii2d=jnp.where(
            visible, jnp.maximum(aux.max_radii2d, radii.astype(jnp.float32)),
            aux.max_radii2d,
        ),
        xyz_grad_accum=aux.xyz_grad_accum + jnp.where(visible, norm, 0.0),
        denom=aux.denom + visible.astype(jnp.float32),
    )


def densify_and_prune(
    params: GaussianParams,
    aux: GaussianAux,
    opt: AdamState,
    key: jax.Array,
    *,
    grad_threshold: float,
    min_opacity: float,
    extent: float,
    max_screen_size: int,
    percent_dense: float,
    unbounded_center: jnp.ndarray | None = None,
) -> tuple[GaussianParams, GaussianAux, AdamState, DensifyStats]:
    """One densify+prune pass; compacts alive Gaussians to the buffer front.

    max_screen_size: 0 disables the size-based prune criteria (the reference
    passes None before the first opacity reset, train.py:119).

    unbounded_center: when set ([3] scene center; skysphere mode), the
    world-size prune threshold scales with max(1, dist/extent) — a far
    shell splat must be large in proportion to its distance to subtend the
    same solid angle, and the flat 0.1*extent cut would delete the entire
    sky shell at the first post-reset densify. None (the default, and
    always when --sky_gaussians 0) keeps the reference's flat threshold
    bit-exactly (reference: scene/gaussian_model.py:398-401).
    """
    cap = params.capacity
    alive = aux.alive
    grads = jnp.where(aux.denom > 0, aux.xyz_grad_accum / jnp.maximum(aux.denom, 1.0), 0.0)
    scaling = params.get_scaling()
    max_scale = jnp.max(scaling, axis=-1)

    hot = alive & (grads >= grad_threshold)
    small = max_scale <= percent_dense * extent
    clone_mask = hot & small
    split_mask = hot & ~small
    keep_mask = alive & ~split_mask

    # --- destination layout: [kept | clones | splitA | splitB] ------------
    n_keep = jnp.sum(keep_mask.astype(jnp.int32))
    n_clone = jnp.sum(clone_mask.astype(jnp.int32))
    n_split = jnp.sum(split_mask.astype(jnp.int32))

    def dests(mask, offset):
        pos = jnp.cumsum(mask.astype(jnp.int32)) - 1 + offset
        return jnp.where(mask, pos, cap)  # cap == dropped

    dst_keep = dests(keep_mask, 0)
    dst_clone = dests(clone_mask, n_keep)
    dst_split_a = dests(split_mask, n_keep + n_clone)
    dst_split_b = dests(split_mask, n_keep + n_clone + n_split)

    # --- split sampling (reference: scene/gaussian_model.py:358-363) ------
    key_a, key_b = jax.random.split(key)
    rot = build_rotation(params.rotation)  # [C,3,3]

    def split_xyz(k):
        sample = jax.random.normal(k, (cap, 3)) * scaling
        return params.xyz + jnp.einsum(
            "nij,nj->ni", rot, sample, precision="highest"
        )

    split_scaling = jnp.log(jnp.maximum(scaling / SPLIT_SCALE_SHRINK, 1e-20))

    def scatter_params(new, src: GaussianParams, dst):
        def s(buf, val):
            return buf.at[dst].set(val, mode="drop")

        return jax.tree.map(s, new, src)

    # Dead-slot fill values keep downstream math finite: identity rotation
    # (zero quats would NaN on normalize), tiny scale, ~zero opacity.
    base = jax.tree.map(jnp.zeros_like, params)
    base = base.replace(
        rotation=base.rotation.at[:, 0].set(1.0),
        scaling=jnp.full_like(base.scaling, DEAD_SCALING_FILL),
        opacity=jnp.full_like(base.opacity, DEAD_OPACITY_FILL),
    )
    split_template = params.replace(scaling=split_scaling)

    new_params = base
    new_params = scatter_params(new_params, params, dst_keep)
    new_params = scatter_params(new_params, params, dst_clone)
    new_params = scatter_params(
        new_params, split_template.replace(xyz=split_xyz(key_a)), dst_split_a
    )
    new_params = scatter_params(
        new_params, split_template.replace(xyz=split_xyz(key_b)), dst_split_b
    )

    # Adam moments: kept rows move with their params; all new rows zero
    # (reference optimizer surgery: scene/gaussian_model.py:273-327).
    def move_moments(tree):
        zeros = jax.tree.map(jnp.zeros_like, tree)
        return jax.tree.map(lambda z, m: z.at[dst_keep].set(m, mode="drop"), zeros, tree)

    new_opt = opt.replace(mu=move_moments(opt.mu), nu=move_moments(opt.nu))

    total = n_keep + n_clone + 2 * n_split
    slot = jnp.arange(cap, dtype=jnp.int32)
    new_alive = slot < jnp.minimum(total, cap)
    n_dropped = jnp.maximum(total - cap, 0)

    # --- final prune (reference: scene/gaussian_model.py:389-401) ---------
    new_opacity = jax.nn.sigmoid(new_params.opacity[:, 0])
    new_max_scale = jnp.max(jnp.exp(new_params.scaling), axis=-1)
    prune = new_opacity < min_opacity
    if max_screen_size:
        # max_radii2D is zeroed by the postfix in the reference, so the
        # screen-size test there never fires; only the world-size test does.
        ws_threshold = 0.1 * extent
        if unbounded_center is not None:
            dist = jnp.linalg.norm(
                new_params.xyz - unbounded_center[None, :], axis=-1
            )
            ws_threshold = ws_threshold * jnp.maximum(1.0, dist / extent)
        prune = prune | (new_max_scale > ws_threshold)
    prune = prune & new_alive
    n_pruned = jnp.sum(prune.astype(jnp.int32))
    new_alive = new_alive & ~prune

    # Dead slots keep zeroed params; push them far behind the camera is not
    # needed — alive masking zeroes their radius in preprocess.
    new_aux = GaussianAux(
        alive=new_alive,
        max_radii2d=jnp.zeros(cap, jnp.float32),
        xyz_grad_accum=jnp.zeros(cap, jnp.float32),
        denom=jnp.zeros(cap, jnp.float32),
    )
    stats = DensifyStats(
        n_alive=jnp.sum(new_alive.astype(jnp.int32)),
        n_cloned=n_clone,
        n_split=n_split,
        n_pruned=n_pruned,
        n_dropped=n_dropped,
    )
    return new_params, new_aux, new_opt, stats


def reset_opacity(
    params: GaussianParams, opt: AdamState, max_opacity: float = 0.01
) -> tuple[GaussianParams, AdamState]:
    """Clamp opacity to <= max_opacity and zero its Adam moments
    (reference: scene/gaussian_model.py:210-213, 258-271)."""
    cur = jax.nn.sigmoid(params.opacity)
    new = jnp.minimum(cur, max_opacity)
    new_raw = jnp.log(new / (1.0 - new))
    return (
        params.replace(opacity=new_raw),
        opt.replace(
            mu=opt.mu.replace(opacity=jnp.zeros_like(opt.mu.opacity)),
            nu=opt.nu.replace(opacity=jnp.zeros_like(opt.nu.opacity)),
        ),
    )
