"""Unit tests for the geometry core (se3/sim3/camera/triangulate/epipolar)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ucoslam_tpu.geometry import (
    se3_exp,
    se3_log,
    se3_inverse,
    se3_apply,
    se3_from_Rt,
    so3_exp,
    so3_log,
    sim3_exp,
    sim3_log,
    sim3_inverse,
    sim3_apply,
    sim3_from_sRt,
    CameraParams,
    triangulate_dlt,
    triangulate_checked,
    fundamental_from_poses,
    epipolar_line_sq_dist,
    horn_align,
    ate_rmse,
)
from ucoslam_tpu.geometry.sim3 import sim3_parts

RNG = np.random.default_rng(0)


def random_se3(batch=()):
    xi = RNG.normal(size=batch + (6,)).astype(np.float32) * 0.5
    return se3_exp(jnp.asarray(xi))


class TestSE3:
    def test_exp_log_roundtrip(self):
        # 0.5x scale keeps |phi| < pi (log is only a left inverse there);
        # float32 trig limits the achievable roundtrip accuracy to ~1e-4.
        xi = jnp.asarray(RNG.normal(size=(64, 6)).astype(np.float32) * 0.5)
        T = se3_exp(xi)
        xi2 = se3_log(T)
        np.testing.assert_allclose(np.asarray(xi2), np.asarray(xi), atol=5e-4)

    def test_exp_small_angle(self):
        xi = jnp.asarray(np.array([[1e-9, 0, 0, 0, 0, 1e-10]], np.float32))
        T = se3_exp(xi)
        np.testing.assert_allclose(np.asarray(T[0]), np.eye(4), atol=1e-6)

    def test_inverse(self):
        T = random_se3((16,))
        eye = T @ se3_inverse(T)
        np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(4), (16, 4, 4)), atol=1e-5)

    def test_rotation_orthonormal(self):
        T = random_se3((8,))
        R = np.asarray(T[..., :3, :3])
        np.testing.assert_allclose(R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (8, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.linalg.det(R), np.ones(8), atol=1e-5)

    def test_apply_matches_matmul(self):
        T = random_se3((4,))
        X = jnp.asarray(RNG.normal(size=(4, 10, 3)).astype(np.float32))
        out = se3_apply(T, X)
        Xh = jnp.concatenate([X, jnp.ones((4, 10, 1))], -1)
        ref = (Xh @ jnp.swapaxes(T, -1, -2))[..., :3]
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_so3_log_near_pi(self):
        axis = np.array([0.0, 0.0, 1.0], np.float32)
        phi = jnp.asarray((axis * 3.1).reshape(1, 3))
        R = so3_exp(phi)
        phi2 = so3_log(R)
        np.testing.assert_allclose(np.asarray(phi2), np.asarray(phi), atol=1e-3)


class TestSim3:
    def test_exp_log_roundtrip(self):
        zeta = jnp.asarray(RNG.normal(size=(32, 7)).astype(np.float32) * 0.4)
        T = sim3_exp(zeta)
        zeta2 = sim3_log(T)
        np.testing.assert_allclose(np.asarray(zeta2), np.asarray(zeta), atol=2e-4)

    def test_identity(self):
        T = sim3_exp(jnp.zeros((7,)))
        np.testing.assert_allclose(np.asarray(T), np.eye(4), atol=1e-6)

    def test_inverse_compose(self):
        zeta = jnp.asarray(RNG.normal(size=(8, 7)).astype(np.float32) * 0.3)
        T = sim3_exp(zeta)
        eye = T @ sim3_inverse(T)
        np.testing.assert_allclose(np.asarray(eye), np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-4)

    def test_parts(self):
        s = jnp.asarray([2.0])
        R = so3_exp(jnp.asarray([[0.1, 0.2, 0.3]]))
        t = jnp.asarray([[1.0, 2.0, 3.0]])
        T = sim3_from_sRt(s, R, t)
        s2, R2, t2 = sim3_parts(T)
        np.testing.assert_allclose(float(s2[0]), 2.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t2), np.asarray(t), atol=1e-5)

    def test_sim3_acts_as_similarity(self):
        zeta = jnp.asarray(RNG.normal(size=(7,)).astype(np.float32) * 0.3)
        T = sim3_exp(zeta)
        s, R, t = sim3_parts(T)
        X = jnp.asarray(RNG.normal(size=(5, 3)).astype(np.float32))
        out = sim3_apply(T, X)
        ref = s * (X @ np.asarray(R).T) + np.asarray(t)
        np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


class TestCamera:
    def cam(self):
        return CameraParams.create(
            fx=517.3, fy=516.5, cx=318.6, cy=255.3,
            dist=[0.26, -0.95, -0.005, 0.003, 1.16],  # TUM fr1-like
            width=640, height=480,
        )

    def test_project_unproject(self):
        cam = self.cam()
        uv = jnp.asarray(RNG.uniform(50, 400, size=(100, 2)).astype(np.float32))
        depth = jnp.asarray(RNG.uniform(0.5, 5.0, size=(100,)).astype(np.float32))
        xyz = cam.unproject(uv, depth)
        uv2 = cam.project(xyz)
        np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)

    def test_undistort_roundtrip(self):
        cam = self.cam()
        uv_und = jnp.asarray(RNG.uniform(150, 350, size=(100, 2)).astype(np.float32))
        uv_dist = cam.distort_points(uv_und)
        uv_back = cam.undistort_points(uv_dist, iters=12)
        np.testing.assert_allclose(np.asarray(uv_back), np.asarray(uv_und), atol=1e-2)

    def test_undistort_matches_opencv(self):
        cv2 = pytest.importorskip("cv2")
        cam = self.cam()
        pts = RNG.uniform(100, 400, size=(50, 2)).astype(np.float32)
        K = np.asarray(cam.K)
        D = np.asarray(cam.dist)
        ref = cv2.undistortPoints(pts.reshape(-1, 1, 2), K, D, P=K).reshape(-1, 2)
        ours = np.asarray(cam.undistort_points(jnp.asarray(pts), iters=20))
        np.testing.assert_allclose(ours, ref, atol=0.05)

    def test_close_point(self):
        cam = CameraParams.create(500, 500, 320, 240, bl=0.1)
        assert bool(cam.is_close_point(jnp.float32(3.9)))
        assert not bool(cam.is_close_point(jnp.float32(4.1)))


class TestTriangulate:
    def setup_scene(self, n=200):
        cam = CameraParams.create(500.0, 500.0, 320.0, 240.0)
        X = RNG.uniform(-2, 2, size=(n, 3)).astype(np.float32)
        X[:, 2] = RNG.uniform(4, 10, size=n)
        T1 = np.eye(4, dtype=np.float32)
        T2 = np.asarray(se3_exp(jnp.asarray([0.5, 0.02, 0.01, 0.01, -0.05, 0.02])))
        uv1 = np.asarray(cam.project(se3_apply(jnp.asarray(T1), jnp.asarray(X))))
        uv2 = np.asarray(cam.project(se3_apply(jnp.asarray(T2), jnp.asarray(X))))
        return cam, X, T1, T2, uv1, uv2

    def test_dlt_exact(self):
        cam, X, T1, T2, uv1, uv2 = self.setup_scene()
        P1 = cam.K @ jnp.asarray(T1[:3, :4])
        P2 = cam.K @ jnp.asarray(T2[:3, :4])
        Xhat = triangulate_dlt(jnp.asarray(uv1), jnp.asarray(uv2), P1, P2)
        np.testing.assert_allclose(np.asarray(Xhat), X, atol=1e-2)

    def test_checked_accepts_good_rejects_behind(self):
        cam, X, T1, T2, uv1, uv2 = self.setup_scene()
        sig = jnp.ones(len(X))
        Xh, ok = triangulate_checked(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.asarray(T1), jnp.asarray(T2),
            cam, cam, sig, sig,
        )
        assert np.asarray(ok).mean() > 0.95
        # corrupt uv2 -> rejected by the chi2 gate
        bad_uv2 = uv2 + 50.0
        _, ok_bad = triangulate_checked(
            jnp.asarray(uv1), jnp.asarray(bad_uv2), jnp.asarray(T1), jnp.asarray(T2),
            cam, cam, sig, sig,
        )
        assert np.asarray(ok_bad).mean() < 0.2


class TestEpipolar:
    def test_epipolar_constraint_zero_for_true_matches(self):
        cam = CameraParams.create(500.0, 500.0, 320.0, 240.0)
        X = RNG.uniform(-1, 1, size=(50, 3)).astype(np.float32)
        X[:, 2] += 6.0
        T1 = jnp.eye(4)
        T2 = se3_exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.1, 0.0]))
        uv1 = cam.project(se3_apply(T1, jnp.asarray(X)))
        uv2 = cam.project(se3_apply(T2, jnp.asarray(X)))
        F12 = fundamental_from_poses(T1, T2, cam, cam)
        d2 = epipolar_line_sq_dist(F12, uv1, uv2)
        diag = np.asarray(d2)[np.arange(50), np.arange(50)]
        assert diag.max() < 1e-2
        # Random pairs should typically be far from the line.
        off = np.asarray(d2)[np.arange(50), (np.arange(50) + 7) % 50]
        assert np.median(off) > 1.0


class TestHorn:
    def test_alignment_recovers_similarity(self):
        X = RNG.normal(size=(100, 3))
        s_true = 2.5
        R_true = np.asarray(so3_exp(jnp.asarray([0.3, -0.2, 0.5])))
        t_true = np.array([1.0, -2.0, 0.5])
        Y = s_true * X @ R_true.T + t_true
        s, R, t = horn_align(X, Y, with_scale=True)
        np.testing.assert_allclose(s, s_true, atol=1e-5)
        np.testing.assert_allclose(R, R_true, atol=1e-5)
        np.testing.assert_allclose(t, t_true, atol=1e-5)
        assert ate_rmse(X, Y) < 1e-5

    def test_ate_nonzero_for_noise(self):
        X = RNG.normal(size=(100, 3))
        Y = X + RNG.normal(size=(100, 3)) * 0.01
        a = ate_rmse(X, Y, with_scale=False)
        assert 0.001 < a < 0.1
