"""Native (C++) components vs their pure-Python/JAX oracles."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from gsjax.native import (
    load_native,
    mean_knn_dist2_native,
    read_points3d_binary_native,
)

needs_native = pytest.mark.skipif(
    load_native() is None, reason="native library unavailable"
)


@needs_native
def test_knn_matches_jax_oracle():
    from gsjax.knn import mean_knn_dist2

    rng = np.random.default_rng(0)
    pts = rng.standard_normal((2000, 3)).astype(np.float32)
    native = mean_knn_dist2_native(pts)
    oracle = np.asarray(mean_knn_dist2(pts))
    np.testing.assert_allclose(native, oracle, rtol=1e-4, atol=1e-6)


@needs_native
def test_knn_tiny_inputs():
    pts = np.array([[0, 0, 0], [1, 0, 0]], np.float32)
    out = mean_knn_dist2_native(pts)
    # Only one neighbor exists; mean over the found neighbors.
    np.testing.assert_allclose(out, [1.0, 1.0], atol=1e-6)


def _write_points3d(path, xyz, rgb, err, track_lens):
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(
                struct.pack(
                    "<QdddBBBd",
                    i + 1,
                    *xyz[i],
                    *rgb[i],
                    err[i],
                )
            )
            f.write(struct.pack("<Q", track_lens[i]))
            for t in range(track_lens[i]):
                f.write(struct.pack("<ii", t, t))


@needs_native
def test_colmap_native_matches_python(tmp_path):
    from gsjax.data.colmap import read_points3d_binary

    rng = np.random.default_rng(1)
    n = 137
    xyz = rng.standard_normal((n, 3))
    rgb = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    err = rng.random(n)
    tracks = rng.integers(0, 7, n)
    path = str(tmp_path / "points3D.bin")
    _write_points3d(path, xyz, rgb, err, tracks)

    nx, nr, ne = read_points3d_binary_native(path)
    np.testing.assert_allclose(nx, xyz)
    np.testing.assert_array_equal(nr, rgb)
    np.testing.assert_allclose(ne, err)

    # The public reader routes through the native path; result identical to
    # the Python loop (forced via env in a subprocess would be equivalent —
    # here compare against the in-file fallback parser directly).
    px, pr, pe = read_points3d_binary(path)
    np.testing.assert_allclose(px, xyz)
    np.testing.assert_array_equal(pr, rgb)
