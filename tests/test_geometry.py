"""Camera / triangulation / alignment tests against numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from orb_slam3_rgbl_tpu.geometry import lie, camera, triangulation, align
from orb_slam3_rgbl_tpu.config import kitti_rgbl_config



def make_cam():
    return kitti_rgbl_config().camera


class TestCamera:
    def test_project_unproject(self, rng):
        cam = make_cam()
        pts = rng.uniform([-20, -5, 4], [20, 5, 80], size=(100, 3))
        uv = camera.project(cam, jnp.asarray(pts))
        rays = np.asarray(camera.unproject(cam, uv))
        recon = rays * pts[:, 2:3]
        np.testing.assert_allclose(recon, pts, rtol=1e-6)

    def test_project_matches_K(self, rng):
        cam = make_cam()
        pts = rng.uniform([-20, -5, 4], [20, 5, 80], size=(50, 3))
        uv = np.asarray(camera.project(cam, jnp.asarray(pts)))
        K = np.asarray(cam.K)
        proj = (K @ pts.T).T
        proj = proj[:, :2] / proj[:, 2:3]
        np.testing.assert_allclose(uv, proj, rtol=1e-6)

    def test_jacobian_matches_autodiff(self, rng):
        cam = make_cam()
        pts = jnp.asarray(rng.uniform([-20, -5, 4], [20, 5, 80], size=(20, 3)))
        J = np.asarray(camera.project_jacobian(cam, pts))
        J_auto = np.asarray(jax.vmap(jax.jacobian(lambda p: camera.project(cam, p)))(pts))
        np.testing.assert_allclose(J, J_auto, rtol=1e-6)

    def test_kb8_roundtrip(self, rng):
        cam = camera.KannalaBrandt8Camera(
            fx=190.9, fy=190.9, cx=254.9, cy=256.8,
            k0=0.0034, k1=0.0007, k2=-0.0019, k3=0.0008,
        )
        pts = rng.uniform([-3, -3, 2], [3, 3, 10], size=(50, 3))
        uv = camera.kb8_project(cam, jnp.asarray(pts))
        rays = np.asarray(camera.kb8_unproject(cam, uv))
        recon = rays / rays[:, 2:3] * pts[:, 2:3]
        np.testing.assert_allclose(recon, pts, rtol=1e-5, atol=1e-5)

    def test_pseudo_stereo(self):
        cam = make_cam()
        depth = jnp.array([10.0, 50.0, -1.0])
        u = jnp.array([100.0, 600.0, 300.0])
        uR = camera.virtual_right_u(cam, u, depth)
        z = camera.stereo_depth_from_disparity(cam, u[:2], uR[:2])
        np.testing.assert_allclose(np.asarray(z), [10.0, 50.0], rtol=1e-6)
        assert np.asarray(uR)[2] == -1.0


class TestTriangulation:
    def _two_view(self, rng, n=50):
        pts = rng.uniform([-10, -5, 10], [10, 5, 60], size=(n, 3))
        T1 = lie.se3_identity(jnp.float64)
        rot = Rotation.from_rotvec([0.0, 0.05, 0.0]).as_quat()  # xyzw
        q = jnp.array([rot[3], rot[0], rot[1], rot[2]])
        T2 = lie.se3(q, jnp.array([-0.54, 0.0, 0.01]))
        xn1 = lie.se3_apply(T1, jnp.asarray(pts))
        xn2 = lie.se3_apply(T2, jnp.asarray(pts))
        xn1 = xn1 / xn1[..., 2:3]
        xn2 = xn2 / xn2[..., 2:3]
        return pts, xn1, xn2, jnp.broadcast_to(T1, (n, 7)), jnp.broadcast_to(T2, (n, 7))

    def test_dlt(self, rng):
        pts, xn1, xn2, T1, T2 = self._two_view(rng)
        X = np.asarray(triangulation.triangulate_dlt(xn1, xn2, T1, T2))
        np.testing.assert_allclose(X, pts, atol=1e-6)

    def test_midpoint(self, rng):
        pts, xn1, xn2, T1, T2 = self._two_view(rng)
        X = np.asarray(triangulation.triangulate_midpoint(xn1, xn2, T1, T2))
        np.testing.assert_allclose(X, pts, atol=1e-6)

    def test_epipolar_zero_for_true_matches(self, rng):
        cam = make_cam()
        pts, xn1, xn2, T1, T2 = self._two_view(rng)
        F12 = triangulation.fundamental_from_poses(cam.K.astype(jnp.float64), cam.K.astype(jnp.float64), T1[0], T2[0])
        uv1 = camera.project(cam, xn1)
        uv2 = camera.project(cam, xn2)
        # NOTE F12 maps kp1(image1) ↔ kp2(image2): x1ᵀ F12 x2 = 0
        d = np.asarray(triangulation.epipolar_distance_sq(F12, uv1, uv2))
        assert np.all(d < 1e-10)

    def test_parallax(self, rng):
        pts, xn1, xn2, T1, T2 = self._two_view(rng)
        c = np.asarray(triangulation.parallax_cos(xn1, xn2, T1, T2))
        assert np.all(c > 0.98) and np.all(c < 1.0)


class TestAlignment:
    def test_horn_recovers_transform(self, rng):
        pts = rng.normal(size=(100, 3)) * 10
        R = Rotation.from_rotvec([0.2, -0.4, 0.9]).as_matrix()
        t = np.array([5.0, -2.0, 1.0])
        s = 1.7
        data = s * pts @ R.T + t
        a = align.horn_align(jnp.asarray(pts), jnp.asarray(data), with_scale=True)
        np.testing.assert_allclose(float(a.s), s, rtol=1e-9)
        np.testing.assert_allclose(np.asarray(lie.quat_to_matrix(a.q)), R, atol=1e-9)
        np.testing.assert_allclose(np.asarray(a.t), t, atol=1e-8)
        assert float(a.rmse) < 1e-9

    def test_horn_rigid(self, rng):
        pts = rng.normal(size=(60, 3)) * 5
        R = Rotation.from_rotvec([0.0, 0.3, 0.0]).as_matrix()
        t = np.array([1.0, 2.0, 3.0])
        data = pts @ R.T + t
        a = align.horn_align(jnp.asarray(pts), jnp.asarray(data), with_scale=False)
        assert float(a.s) == 1.0
        assert float(a.rmse) < 1e-10

    def test_weighted_ignores_outliers(self, rng):
        pts = rng.normal(size=(50, 3))
        data = pts + np.array([1.0, 0, 0])
        data[0] += 1000.0  # gross outlier
        w = np.ones(50)
        w[0] = 0.0
        a = align.horn_align(jnp.asarray(pts), jnp.asarray(data), weights=jnp.asarray(w))
        assert float(a.rmse) < 1e-9

    def test_ate_rmse_known_error(self, rng):
        gt = rng.normal(size=(100, 3))
        noise = rng.normal(size=(100, 3))
        noise = noise / np.linalg.norm(noise, axis=1, keepdims=True) * 0.5
        est = gt + noise
        r = float(align.ate_rmse(jnp.asarray(gt), jnp.asarray(est)))
        assert 0.1 < r <= 0.5

    def test_sim3_from_correspondences(self, rng):
        p1 = rng.normal(size=(30, 3))
        S_true = lie.sim3_exp(jnp.asarray(rng.normal(size=7) * 0.3))
        p2 = lie.sim3_apply(S_true, jnp.asarray(p1))
        S = align.sim3_from_correspondences(jnp.asarray(p1), p2)
        p2_hat = lie.sim3_apply(S, jnp.asarray(p1))
        np.testing.assert_allclose(np.asarray(p2_hat), np.asarray(p2), atol=1e-8)
