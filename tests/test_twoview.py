"""Two-view initialization solvers: F/H RANSAC + motion recovery."""

import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.geometry import CameraParams, se3_exp, se3_apply
from ucoslam_tpu.geometry.twoview import estimate_two_view, reconstruct_two_view

RNG = np.random.default_rng(41)
CAM = CameraParams.create(500.0, 500.0, 320.0, 240.0)


def general_scene(n=300, noise=0.3, outlier_frac=0.1):
    X = RNG.uniform(-3, 3, (n, 3)).astype(np.float32)
    X[:, 2] = RNG.uniform(4, 12, n)
    T21 = se3_exp(jnp.asarray([0.6, 0.05, 0.1, 0.02, -0.08, 0.03]))
    uv1 = np.asarray(CAM.project(jnp.asarray(X))).copy()
    uv2 = np.asarray(CAM.project(se3_apply(T21, jnp.asarray(X)))).copy()
    uv1 += RNG.normal(0, noise, uv1.shape)
    uv2 += RNG.normal(0, noise, uv2.shape)
    out = RNG.random(n) < outlier_frac
    uv2[out] = RNG.uniform(0, 640, (int(out.sum()), 2))
    return X, T21, uv1.astype(np.float32), uv2.astype(np.float32), out


def planar_scene(n=300, noise=0.3):
    X = RNG.uniform(-3, 3, (n, 3)).astype(np.float32)
    X[:, 2] = 6.0 + 0.3 * X[:, 0] + 0.1 * X[:, 1]  # a tilted plane
    T21 = se3_exp(jnp.asarray([0.5, 0.1, 0.05, 0.03, -0.06, 0.02]))
    uv1 = np.asarray(CAM.project(jnp.asarray(X))) + RNG.normal(0, noise, (n, 2))
    uv2 = np.asarray(CAM.project(se3_apply(T21, jnp.asarray(X)))) + RNG.normal(0, noise, (n, 2))
    return X, T21, uv1.astype(np.float32), uv2.astype(np.float32)


def angle_between(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


def check_pose(rec, T21):
    R_est = np.asarray(rec.pose_21[:3, :3])
    t_est = np.asarray(rec.pose_21[:3, 3])
    R_true = np.asarray(T21[:3, :3])
    t_true = np.asarray(T21[:3, 3])
    t_true = t_true / np.linalg.norm(t_true)
    assert angle_between(R_est, R_true) < 1.0, f"R err {angle_between(R_est, R_true)}"
    assert np.dot(t_est, t_true) > 0.99, f"t dir {np.dot(t_est, t_true)}"


class TestGeneralScene:
    def test_f_model_wins_and_pose_recovered(self):
        X, T21, uv1, uv2, out = general_scene()
        model = estimate_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool),
            jnp.ones(len(uv1)), jax.random.PRNGKey(0),
        )
        ratio_h = float(model.score_h / (model.score_h + model.score_f))
        assert ratio_h < 0.45, f"H ratio {ratio_h} on general scene"
        inl_f = np.asarray(model.inliers_f)
        assert inl_f[~out].mean() > 0.9
        assert inl_f[out].mean() < 0.1
        rec = reconstruct_two_view(
            model, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool),
            jnp.ones(len(uv1)), CAM, CAM,
        )
        assert bool(rec.ok)
        assert int(rec.n_good) > 200
        check_pose(rec, T21)
        # triangulated structure correct up to the unit-baseline scale
        scale = np.linalg.norm(np.asarray(T21[:3, 3]))
        Xh = np.asarray(rec.points) * scale
        ok = np.asarray(rec.point_ok)
        err = np.linalg.norm(Xh[ok] - X[ok], axis=1)
        assert np.median(err) < 0.15

    def test_pure_rotation_rejected(self):
        n = 300
        X = RNG.uniform(-3, 3, (n, 3)).astype(np.float32)
        X[:, 2] = RNG.uniform(4, 12, n)
        T21 = se3_exp(jnp.asarray([0.0, 0.0, 0.0, 0.02, -0.05, 0.01]))  # no translation
        uv1 = np.asarray(CAM.project(jnp.asarray(X))) + RNG.normal(0, 0.3, (n, 2))
        uv2 = np.asarray(CAM.project(se3_apply(T21, jnp.asarray(X)))) + RNG.normal(0, 0.3, (n, 2))
        model = estimate_two_view(
            jnp.asarray(uv1.astype(np.float32)), jnp.asarray(uv2.astype(np.float32)),
            jnp.ones(n, bool), jnp.ones(n), jax.random.PRNGKey(1),
        )
        rec = reconstruct_two_view(
            model, jnp.asarray(uv1.astype(np.float32)), jnp.asarray(uv2.astype(np.float32)),
            jnp.ones(n, bool), jnp.ones(n), CAM, CAM,
        )
        assert not bool(rec.ok)  # no parallax => must refuse to initialize


class TestPlanarScene:
    def test_h_model_wins_and_pose_recovered(self):
        X, T21, uv1, uv2 = planar_scene()
        model = estimate_two_view(
            jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool),
            jnp.ones(len(uv1)), jax.random.PRNGKey(2),
        )
        ratio_h = float(model.score_h / (model.score_h + model.score_f))
        assert ratio_h > 0.40, f"H ratio {ratio_h} on planar scene"
        rec = reconstruct_two_view(
            model, jnp.asarray(uv1), jnp.asarray(uv2), jnp.ones(len(uv1), bool),
            jnp.ones(len(uv1)), CAM, CAM,
        )
        assert bool(rec.ok)
        check_pose(rec, T21)
