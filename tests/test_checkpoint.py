"""Checkpoint round-trips: npz and Orbax (SURVEY.md §5.4)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.synthetic import random_scene
from gsjax.train.checkpoint import (
    load_checkpoint,
    save_checkpoint,
)
from gsjax.train.optimizer import adam_init
from gsjax.train.step import TrainState


def _state():
    params, aux = random_scene(50, capacity=64, sh_degree=2, seed=5)
    opt = adam_init(params)
    opt = opt.replace(
        count=jnp.int32(7), mu=jax.tree.map(lambda x: x + 0.25, opt.mu)
    )
    return TrainState(params=params, opt=opt, aux=aux, step=jnp.int32(123))


def _assert_state_equal(a: TrainState, b: TrainState):
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_npz_roundtrip(tmp_path):
    state = _state()
    path = str(tmp_path / "chk.npz")
    save_checkpoint(path, state, active_sh_degree=2, spatial_lr_scale=3.5)
    restored, sh, lr = load_checkpoint(path)
    assert sh == 2 and lr == 3.5
    assert int(restored.step) == 123
    assert int(restored.opt.count) == 7
    _assert_state_equal(state, restored)


def test_orbax_roundtrip(tmp_path):
    ocp = pytest.importorskip("orbax.checkpoint")
    from gsjax.train.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    state = _state()
    path = str(tmp_path / "orbax_ckpt")
    save_checkpoint_orbax(
        path, state, active_sh_degree=1, spatial_lr_scale=2.0,
        extra={"probe": np.arange(4, dtype=np.int32)},
    )
    restored, sh, lr, extra = load_checkpoint_orbax(path)
    assert sh == 1 and lr == 2.0
    np.testing.assert_array_equal(extra["probe"], np.arange(4))
    _assert_state_equal(state, restored)


def test_npz_save_is_atomic_and_overwrites(tmp_path):
    """A save never leaves a partial archive at the final path (it goes
    through tmp + os.replace — the r5 quality run lost 2000 iterations to a
    SIGTERM mid-np.savez), and overwriting an existing checkpoint works."""
    import os

    state = _state()
    path = str(tmp_path / "chk.npz")
    save_checkpoint(path, state, active_sh_degree=2, spatial_lr_scale=3.5)
    # Overwrite in place (periodic checkpoints reuse paths across resumes).
    save_checkpoint(path, state, active_sh_degree=3, spatial_lr_scale=3.5)
    _, sh, _ = load_checkpoint(path)
    assert sh == 3
    assert os.listdir(tmp_path) == ["chk.npz"]  # no tmp residue
    # Extension-less path lands at .npz like np.savez would.
    save_checkpoint(str(tmp_path / "bare"), state, 1, 1.0)
    assert (tmp_path / "bare.npz").exists()
