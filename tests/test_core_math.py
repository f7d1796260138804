"""Unit tests for the math core against independently-derived values and the
reference formulas (SURVEY.md section 4 item 2)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsjax.core import cameras, sh, transforms


class TestSH:
    def test_degree0_is_constant(self):
        coeffs = jnp.zeros((5, 1, 3)).at[:, 0, :].set(jnp.arange(15.0).reshape(5, 3))
        dirs = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
        dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        out = sh.eval_sh(0, coeffs, dirs)
        np.testing.assert_allclose(out, sh.C0 * coeffs[:, 0, :], rtol=1e-6)

    def test_band1_signs(self):
        # Coefficient layout: [dc, y, z, x]; basis = (-C1*y, C1*z, -C1*x).
        coeffs = jnp.zeros((1, 4, 1)).at[0, 1, 0].set(1.0)
        out_y = sh.eval_sh(1, coeffs, jnp.array([[0.0, 1.0, 0.0]]))
        np.testing.assert_allclose(out_y, -sh.C1, rtol=1e-6)
        coeffs = jnp.zeros((1, 4, 1)).at[0, 2, 0].set(1.0)
        out_z = sh.eval_sh(1, coeffs, jnp.array([[0.0, 0.0, 1.0]]))
        np.testing.assert_allclose(out_z, sh.C1, rtol=1e-6)
        coeffs = jnp.zeros((1, 4, 1)).at[0, 3, 0].set(1.0)
        out_x = sh.eval_sh(1, coeffs, jnp.array([[1.0, 0.0, 0.0]]))
        np.testing.assert_allclose(out_x, -sh.C1, rtol=1e-6)

    @pytest.mark.parametrize("deg", [2, 4])
    def test_orthonormality(self, deg):
        # Monte-Carlo check: E[b_i b_j] over the sphere = delta_ij / (4 pi).
        n = 50_000
        rng = np.random.default_rng(1)
        dirs = rng.standard_normal((n, 3))
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        basis = np.asarray(sh.sh_basis(deg, jnp.asarray(dirs, jnp.float32)), np.float64)
        gram = basis.T @ basis / n * (4.0 * math.pi)
        np.testing.assert_allclose(
            gram, np.eye(sh.num_sh_coeffs(deg)), atol=0.15
        )

    def test_rgb_sh_roundtrip(self):
        rgb = jnp.array([[0.1, 0.5, 0.9]])
        np.testing.assert_allclose(sh.SH2RGB(sh.RGB2SH(rgb)), rgb, rtol=1e-6)


class TestTransforms:
    def test_identity_quaternion(self):
        R = transforms.build_rotation(jnp.array([[1.0, 0.0, 0.0, 0.0]]))
        np.testing.assert_allclose(R[0], np.eye(3), atol=1e-6)

    def test_rotation_orthonormal(self):
        q = jax.random.normal(jax.random.PRNGKey(0), (32, 4))
        R = np.asarray(transforms.build_rotation(q), dtype=np.float64)
        eye = np.einsum("nij,nkj->nik", R, R)
        np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (32, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)

    def test_90deg_z_rotation(self):
        # quat (cos45, 0, 0, sin45) = 90 degrees about z: x -> y.
        c = math.cos(math.pi / 4)
        q = jnp.array([[c, 0.0, 0.0, c]])
        R = transforms.build_rotation(q)
        np.testing.assert_allclose(R[0] @ np.array([1.0, 0, 0]), [0, 1, 0], atol=1e-6)

    def test_covariance_psd_and_eigvals(self):
        # Diagonal case: covariance eigenvalues are the squared scales.
        s = jnp.array([[0.5, 1.0, 2.0]])
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        cov6 = transforms.build_covariance(s, 1.0, q)
        np.testing.assert_allclose(
            cov6[0], [0.25, 0.0, 0.0, 1.0, 0.0, 4.0], atol=1e-6
        )
        # Rotated case: eigenvalues invariant.
        q = jax.random.normal(jax.random.PRNGKey(3), (8, 4))
        s = jnp.exp(jax.random.normal(jax.random.PRNGKey(4), (8, 3)) * 0.3)
        cov = transforms.cov6_to_mat(transforms.build_covariance(s, 1.0, q))
        eig = np.sort(np.linalg.eigvalsh(np.asarray(cov)), axis=-1)
        np.testing.assert_allclose(eig, np.sort(np.asarray(s) ** 2, axis=-1), rtol=1e-4)

    def test_scaling_modifier(self):
        s = jnp.array([[1.0, 1.0, 1.0]])
        q = jnp.array([[1.0, 0.0, 0.0, 0.0]])
        cov = np.asarray(transforms.build_covariance(s, 2.0, q))
        np.testing.assert_allclose(cov[0][[0, 3, 5]], 4.0, atol=1e-6)

    def test_inverse_sigmoid(self):
        x = jnp.array([0.1, 0.5, 0.9])
        np.testing.assert_allclose(
            jax.nn.sigmoid(transforms.inverse_sigmoid(x)), x, rtol=1e-5
        )


class TestCameras:
    def test_fov_focal_roundtrip(self):
        assert cameras.focal2fov(cameras.fov2focal(0.8, 640), 640) == pytest.approx(0.8)

    def test_projection_matrix_corners(self):
        # A point on the near plane at the fov edge maps to ndc x = +-1.
        P = cameras.projection_matrix(0.01, 100.0, 0.9, 0.7)
        tan_x = math.tan(0.45)
        pt = np.array([tan_x * 0.01, 0.0, 0.01, 1.0])
        clip = P @ pt
        assert clip[0] / clip[3] == pytest.approx(1.0, abs=1e-5)
        # Depth maps: znear -> ~0... zfar -> zfar/(zfar-znear)*... check z/w at far.
        pt_far = np.array([0.0, 0.0, 100.0, 1.0])
        clip_far = P @ pt_far
        assert clip_far[2] / clip_far[3] == pytest.approx(1.0, abs=1e-4)

    def test_world_to_view_roundtrip(self):
        rng = np.random.default_rng(0)
        # Random valid rotation via QR.
        Q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        t = rng.standard_normal(3)
        # R is stored transposed (COLMAP convention).
        # world_to_view re-transposes the stored rotation: view rot = Q.
        view = cameras.world_to_view(Q.T, t)
        np.testing.assert_allclose(view[:3, :3], Q, atol=1e-5)
        cam = cameras.Camera.create(Q.T.astype(np.float32), t.astype(np.float32),
                                    0.9, 0.7, 64, 48)
        # camera center maps to the view-space origin.
        c = np.asarray(cam.cam_center)
        hom = np.concatenate([c, [1.0]])
        np.testing.assert_allclose((np.asarray(cam.view) @ hom)[:3], 0.0, atol=1e-4)

    def test_full_proj_consistency(self):
        cam = cameras.Camera.create(
            np.eye(3, dtype=np.float32), np.zeros(3, np.float32), 0.9, 0.7, 64, 48
        )
        pt = np.array([0.3, -0.2, 5.0, 1.0], np.float32)
        clip = np.asarray(cam.full_proj) @ pt
        view_pt = (np.asarray(cam.view) @ pt)[:3]
        proj = cameras.projection_matrix(cameras.ZNEAR, cameras.ZFAR, 0.9, 0.7)
        clip2 = proj @ np.concatenate([view_pt, [1.0]])
        np.testing.assert_allclose(clip, clip2, rtol=1e-5)

    def test_ndc_to_pixel(self):
        # ndc -1 -> -0.5, ndc +1 -> S - 0.5
        np.testing.assert_allclose(cameras.ndc_to_pixel(jnp.array(-1.0), 64), -0.5)
        np.testing.assert_allclose(cameras.ndc_to_pixel(jnp.array(1.0), 64), 63.5)
