"""Data-layer golden tests: resolution policy, PLY schema round-trips, the
every-8th eval split, and the NeRF++ normalization — the reference's data
contracts (reference: utils/camera_utils.py:19-60,
scene/gaussian_model.py:177-256, scene/dataset_readers.py:45-66,148-153).
"""

from __future__ import annotations

import numpy as np
import pytest

from gsjax.data.camera_utils import resolve_resolution
from gsjax.data.ply import (
    fetch_points_ply,
    load_gaussian_ply,
    read_ply,
    save_gaussian_ply,
    store_points_ply,
)


class TestResolutionPolicy:
    def test_divisors(self):
        assert resolve_resolution(800, 600, 1) == (800, 600)
        assert resolve_resolution(800, 600, 2) == (400, 300)
        assert resolve_resolution(800, 600, 4) == (200, 150)
        assert resolve_resolution(800, 600, 8) == (100, 75)

    def test_auto_caps_1600(self):
        w, h = resolve_resolution(3200, 2400, -1)
        assert w == 1600 and h == 1200

    def test_auto_leaves_small(self):
        assert resolve_resolution(1200, 900, -1) == (1200, 900)

    def test_explicit_target_width(self):
        w, h = resolve_resolution(3000, 1500, 1000)
        assert w == 1000 and h == 500

    def test_resolution_scale(self):
        assert resolve_resolution(800, 600, 2, resolution_scale=2.0) == (200, 150)


class TestGaussianPly:
    def _params(self, n=7, sh=3):
        from gsjax.model import GaussianParams

        rng = np.random.default_rng(0)
        k = (sh + 1) ** 2
        return GaussianParams(
            xyz=rng.normal(size=(n, 3)).astype(np.float32),
            features_dc=rng.normal(size=(n, 1, 3)).astype(np.float32),
            features_rest=rng.normal(size=(n, k - 1, 3)).astype(np.float32),
            scaling=rng.normal(size=(n, 3)).astype(np.float32),
            rotation=rng.normal(size=(n, 4)).astype(np.float32),
            opacity=rng.normal(size=(n, 1)).astype(np.float32),
        )

    def test_schema_matches_reference(self, tmp_path):
        """Exact attribute names + order of the reference PLY writer
        (reference: scene/gaussian_model.py:177-208)."""
        p = str(tmp_path / "pc.ply")
        save_gaussian_ply(p, self._params())
        cols = read_ply(p)
        expect = (
            ["x", "y", "z", "nx", "ny", "nz"]
            + [f"f_dc_{i}" for i in range(3)]
            + [f"f_rest_{i}" for i in range(45)]
            + ["opacity"]
            + [f"scale_{i}" for i in range(3)]
            + [f"rot_{i}" for i in range(4)]
        )
        assert list(cols.keys()) == expect

    def test_roundtrip_exact(self, tmp_path):
        params = self._params()
        p = str(tmp_path / "pc.ply")
        save_gaussian_ply(p, params)
        back = load_gaussian_ply(p)
        np.testing.assert_array_equal(back["xyz"], np.asarray(params.xyz))
        np.testing.assert_array_equal(
            back["features_dc"], np.asarray(params.features_dc)
        )
        np.testing.assert_array_equal(
            back["features_rest"], np.asarray(params.features_rest)
        )
        np.testing.assert_array_equal(back["opacity"], np.asarray(params.opacity))
        np.testing.assert_array_equal(back["scaling"], np.asarray(params.scaling))
        np.testing.assert_array_equal(back["rotation"], np.asarray(params.rotation))

    def test_alive_mask_drops_dead_rows(self, tmp_path):
        params = self._params(n=6)
        alive = np.array([1, 0, 1, 1, 0, 1], bool)
        p = str(tmp_path / "pc.ply")
        save_gaussian_ply(p, params, alive=alive)
        back = load_gaussian_ply(p)
        assert back["xyz"].shape[0] == 4
        np.testing.assert_array_equal(back["xyz"], np.asarray(params.xyz)[alive])

    def test_points_ply_roundtrip(self, tmp_path):
        rng = np.random.default_rng(1)
        xyz = rng.normal(size=(11, 3)).astype(np.float32)
        rgb = rng.integers(0, 256, (11, 3)).astype(np.float64)
        p = str(tmp_path / "points.ply")
        store_points_ply(p, xyz, rgb)
        x2, c2, _ = fetch_points_ply(p)
        np.testing.assert_allclose(x2, xyz, atol=1e-6)
        np.testing.assert_allclose(c2 * 255.0, rgb, atol=1.0)


class TestColmapText:
    def test_images_text_with_empty_points2d(self, tmp_path):
        """An image with ZERO observed points has an EMPTY POINTS2D line;
        pairing records by non-blank-line parity misparses everything after
        it (reference reads the next line unconditionally)."""
        from gsjax.data.colmap import read_images_text

        p = tmp_path / "images.txt"
        p.write_text(
            "# images.txt\n"
            "1 0.1 0.2 0.3 0.9 1.0 2.0 3.0 1 a.png\n"
            "384.5 120.2 17 22.1 55.0 3\n"
            "2 0.4 0.5 0.6 0.7 4.0 5.0 6.0 1 b.png\n"
            "\n"  # zero observations
            "3 0.7 0.8 0.9 0.1 7.0 8.0 9.0 2 c.png\n"
            "1.0 2.0 5\n"
        )
        images = read_images_text(str(p))
        assert sorted(images) == [1, 2, 3]
        assert images[2].name == "b.png"
        assert images[3].camera_id == 2
        np.testing.assert_allclose(images[3].tvec, [7.0, 8.0, 9.0])


class TestSplitsAndNorm:
    def _infos(self, n):
        from gsjax.data.dataset import CameraInfo

        infos = []
        for i in range(n):
            c2w_t = np.zeros(3)
            c2w_t[0] = np.cos(i)
            c2w_t[2] = np.sin(i)
            infos.append(
                CameraInfo(
                    uid=i,
                    R=np.eye(3),
                    T=-c2w_t,  # world_to_view translation: camera at c2w_t
                    fov_x=0.8,
                    fov_y=0.6,
                    image_path=f"im_{i:03d}.png",
                    image_name=f"im_{i:03d}",
                    width=64,
                    height=48,
                )
            )
        return infos

    def test_llffhold_every_8th(self):
        """(reference: scene/dataset_readers.py:148-153)"""
        infos = self._infos(20)
        train = [c for i, c in enumerate(infos) if i % 8 != 0]
        test = [c for i, c in enumerate(infos) if i % 8 == 0]
        from gsjax.data.dataset import read_colmap_scene_info  # noqa: F401

        assert len(test) == 3 and len(train) == 17
        assert {c.uid for c in test} == {0, 8, 16}

    def test_nerfpp_norm_radius(self):
        """Camera-centroid diagonal * 1.1 (reference:
        scene/dataset_readers.py:45-66)."""
        from gsjax.data.dataset import get_nerfpp_norm

        infos = self._infos(12)
        norm = get_nerfpp_norm(infos)
        centers = np.stack(
            [-info.T for info in infos]  # R = I so center = -T
        )
        centroid = centers.mean(axis=0)
        diag = np.linalg.norm(centers - centroid, axis=1).max()
        np.testing.assert_allclose(norm["radius"], diag * 1.1, rtol=1e-5)
        np.testing.assert_allclose(norm["translate"], -centroid, atol=1e-5)
