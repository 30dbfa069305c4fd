"""Two-view relative geometry: H/F RANSAC, model selection, motion recovery.

Counterpart of the keypoint path of the reference MapInitializer
(mapinitializer.cpp:764-1520: parallel Homography/Fundamental hypotheses via
SVD :4276-4654, motion recovery, Triangulate :1574) — itself the well-known
ORB-SLAM2 initializer. All hypotheses are vmapped; model scoring uses the
standard truncated chi2 scores with thresholds 3.841 (F, 1 dof) and 5.991
(H, 2 dof).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ucoslam_tpu.config import CHI2_1D, CHI2_2D
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.geometry.se3 import se3_from_Rt
from ucoslam_tpu.geometry.triangulate import triangulate_dlt

TH_F = CHI2_1D  # 3.841
TH_H = CHI2_2D  # 5.991
TH_SCORE = CHI2_2D  # score truncation, as ORB-SLAM


def _normalize_points(uv: jnp.ndarray, valid: jnp.ndarray):
    """Hartley normalization. Returns (uv_norm, T (3,3))."""
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    mean = jnp.sum(uv * w[:, None], 0) / n
    d = jnp.sum(jnp.abs(uv - mean) * w[:, None], 0) / n
    s = 1.0 / d.clip(1e-6)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s[0]).at[1, 1].set(s[1])
    T = T.at[0, 2].set(-mean[0] * s[0]).at[1, 2].set(-mean[1] * s[1])
    return (uv - mean) * s, T


def _fundamental_8pt(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """8-point F from (8, 2) + (8, 2) normalized points (rank-2 enforced)."""
    u1, v1 = uv1[:, 0], uv1[:, 1]
    u2, v2 = uv2[:, 0], uv2[:, 1]
    ones = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], -1
    )  # (8, 9)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    F = vecs[:, 0].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ jnp.diag(S) @ Vt


def _homography_4pt(uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """DLT H from (S>=4, 2) pairs (normalized coords)."""
    s = uv1.shape[0]
    u1 = jnp.concatenate([uv1, jnp.ones((s, 1))], -1)  # (S, 3)
    zeros = jnp.zeros((s, 3))
    x2, y2 = uv2[:, 0:1], uv2[:, 1:2]
    rows1 = jnp.concatenate([zeros, -u1, y2 * u1], -1)  # (S, 9)
    rows2 = jnp.concatenate([u1, zeros, -x2 * u1], -1)
    A = jnp.concatenate([rows1, rows2], 0)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    return vecs[:, 0].reshape(3, 3)


def _sym_epipolar_chi2(F12, uv1, uv2):
    """Per-match symmetric epipolar chi2 pair (d(x2, F x1), d(x1, F^T x2))."""
    ones = jnp.ones(uv1.shape[:-1] + (1,))
    x1 = jnp.concatenate([uv1, ones], -1)
    x2 = jnp.concatenate([uv2, ones], -1)
    l2 = x1 @ F12.T  # lines in image 2
    l1 = x2 @ F12  # lines in image 1
    num = jnp.sum(x2 * l2, -1)
    d2_2 = num * num / (l2[:, 0] ** 2 + l2[:, 1] ** 2).clip(1e-12)
    d2_1 = num * num / (l1[:, 0] ** 2 + l1[:, 1] ** 2).clip(1e-12)
    return d2_1, d2_2


def _sym_transfer_chi2(H, uv1, uv2):
    """Symmetric transfer errors for homography."""
    ones = jnp.ones(uv1.shape[:-1] + (1,))
    x1 = jnp.concatenate([uv1, ones], -1)
    x2 = jnp.concatenate([uv2, ones], -1)
    Hx1 = x1 @ H.T
    Hx1 = Hx1[:, :2] / Hx1[:, 2:3].clip(1e-12) * jnp.sign(Hx1[:, 2:3] + 1e-30)
    Hinv = jnp.linalg.inv(H)
    Hx2 = x2 @ Hinv.T
    Hx2 = Hx2[:, :2] / Hx2[:, 2:3].clip(1e-12) * jnp.sign(Hx2[:, 2:3] + 1e-30)
    e12 = jnp.sum((Hx1 - uv2) ** 2, -1)
    e21 = jnp.sum((Hx2 - uv1) ** 2, -1)
    return e21, e12


class TwoViewModel(NamedTuple):
    F: jnp.ndarray  # (3, 3) best fundamental (pixel coords)
    H: jnp.ndarray  # (3, 3) best homography (pixel coords)
    score_f: jnp.ndarray  # ()
    score_h: jnp.ndarray  # ()
    inliers_f: jnp.ndarray  # (M,) bool
    inliers_h: jnp.ndarray  # (M,) bool


@partial(jax.jit, static_argnames=("n_hypotheses",))
def estimate_two_view(
    uv1: jnp.ndarray,  # (M, 2) undistorted pixels in frame 1
    uv2: jnp.ndarray,  # (M, 2) matched pixels in frame 2
    valid: jnp.ndarray,  # (M,) bool
    sigma2: jnp.ndarray,  # (M,) per-match variance
    key: jnp.ndarray,
    n_hypotheses: int = 256,
) -> TwoViewModel:
    """RANSAC both F and H on the same matches (parallel hypothesis search,
    as the reference/ORB-SLAM run both in parallel threads)."""
    n1, T1 = _normalize_points(uv1, valid)
    n2, T2 = _normalize_points(uv2, valid)
    logits = jnp.where(valid, 0.0, -1e9)
    keys = jax.random.split(key, n_hypotheses)

    def hyp(k):
        idx = jax.random.categorical(k, logits, shape=(8,))
        Fn = _fundamental_8pt(n1[idx], n2[idx])
        F = T2.T @ Fn @ T1
        Hn = _homography_4pt(n1[idx[:4]], n2[idx[:4]])
        H = jnp.linalg.inv(T2) @ Hn @ T1
        return F, H

    Fs, Hs = jax.vmap(hyp)(keys)

    w = valid.astype(jnp.float32)

    def score_f(F):
        d1, d2 = _sym_epipolar_chi2(F, uv1, uv2)
        c1, c2 = d1 / sigma2, d2 / sigma2
        ok = (c1 < TH_F) & (c2 < TH_F) & valid
        sc = jnp.where(c1 < TH_F, TH_SCORE - c1, 0.0) + jnp.where(
            c2 < TH_F, TH_SCORE - c2, 0.0
        )
        return jnp.sum(sc * w), ok

    def score_h(H):
        e1, e2 = _sym_transfer_chi2(H, uv1, uv2)
        c1, c2 = e1 / sigma2, e2 / sigma2
        ok = (c1 < TH_H) & (c2 < TH_H) & valid
        sc = jnp.where(c1 < TH_H, TH_SCORE - c1, 0.0) + jnp.where(
            c2 < TH_H, TH_SCORE - c2, 0.0
        )
        return jnp.sum(sc * w), ok

    sf, okf = jax.vmap(score_f)(Fs)
    sh, okh = jax.vmap(score_h)(Hs)
    bi_f = jnp.argmax(sf)
    bi_h = jnp.argmax(sh)
    return TwoViewModel(
        F=Fs[bi_f],
        H=Hs[bi_h],
        score_f=sf[bi_f],
        score_h=sh[bi_h],
        inliers_f=okf[bi_f],
        inliers_h=okh[bi_h],
    )


def _candidate_poses_from_E(E: jnp.ndarray):
    """4 candidate (R, t) from an essential matrix. t normalized."""
    U, _, Vt = jnp.linalg.svd(E)
    # ensure rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / jnp.linalg.norm(t).clip(1e-12)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])
    return Rs, ts


def _candidate_poses_from_H(H_cal: jnp.ndarray):
    """8 candidate (R, t, n) from calibrated homography (Faugeras 1988).

    H_cal = K2^-1 H K1 (maps normalized coords 1 -> 2).
    """
    U, S, Vt = jnp.linalg.svd(H_cal)
    d1, d2, d3 = S[0], S[1], S[2]
    s = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    V = Vt.T

    # x1/x3 magnitudes (d' = d2 case)
    denom1 = (d1 * d1 - d3 * d3).clip(1e-12)
    aux1 = jnp.sqrt(((d1 * d1 - d2 * d2) / denom1).clip(0.0))
    aux3 = jnp.sqrt(((d2 * d2 - d3 * d3) / denom1).clip(0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # case d' = +d2
    sin_t = jnp.sqrt(
        ((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3)).clip(0.0)
    ) / ((d1 + d3) * d2).clip(1e-12)
    cos_t = (d2 * d2 + d1 * d3) / ((d1 + d3) * d2).clip(1e-12)

    def pos_case(x1, x3, eps):
        st = eps * sin_t
        Rp = jnp.array(
            [[cos_t, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, cos_t]]
        )
        R = s * U @ Rp @ Vt
        tp = (d1 - d3) * jnp.array([x1, 0.0, -x3])
        t = U @ tp
        return R, t

    # case d' = -d2
    sin_p = jnp.sqrt(
        ((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3)).clip(0.0)
    ) / ((d1 - d3) * d2).clip(1e-12)
    cos_p = (d1 * d3 - d2 * d2) / ((d1 - d3) * d2).clip(1e-12)

    def neg_case(x1, x3, eps):
        sp = eps * sin_p
        Rp = jnp.array(
            [[cos_p, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cos_p]]
        )
        R = s * U @ Rp @ Vt
        tp = (d1 + d3) * jnp.array([x1, 0.0, x3])
        t = U @ tp
        return R, t

    # Sign enumeration follows Faugeras: sin-term sign couples to the signs
    # of x1 and x3 (eps1 * eps3).
    Rs, ts = [], []
    for i in range(4):
        R, t = pos_case(x1s[i], x3s[i], jnp.sign(x1s[i] + 1e-30) * jnp.sign(x3s[i] + 1e-30))
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = neg_case(x1s[i], x3s[i], jnp.sign(x1s[i] + 1e-30) * jnp.sign(x3s[i] + 1e-30))
        Rs.append(R)
        ts.append(t)
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    norm = jnp.linalg.norm(ts, axis=-1, keepdims=True).clip(1e-12)
    return Rs, ts / norm


class Reconstruction(NamedTuple):
    ok: jnp.ndarray  # () bool
    pose_21: jnp.ndarray  # (4, 4) pose of frame2 wrt frame1 (T: cam1 -> cam2)
    points: jnp.ndarray  # (M, 3) triangulated in frame-1 camera coords
    point_ok: jnp.ndarray  # (M,) bool
    n_good: jnp.ndarray  # () int32


def _check_pose(R, t, uv1, uv2, valid, cam1: CameraParams, cam2: CameraParams, sigma2):
    """Triangulate all matches under candidate (R, t); count cheirality+reproj
    inliers and median parallax (ORB-SLAM CheckRT)."""
    T1 = jnp.eye(4)
    T2 = se3_from_Rt(R, t)
    P1 = cam1.K @ T1[:3, :4]
    P2 = cam2.K @ T2[:3, :4]
    X = triangulate_dlt(uv1, uv2, P1, P2)
    z1 = X[:, 2]
    Xc2 = X @ R.T + t
    z2 = Xc2[:, 2]
    r1 = cam1.project(X) - uv1
    r2 = cam2.project(Xc2) - uv2
    c1 = jnp.sum(r1 * r1, -1) / sigma2
    c2 = jnp.sum(r2 * r2, -1) / sigma2
    # parallax
    o2 = -R.T @ t
    ray1 = X
    ray2 = X - o2
    cosp = jnp.sum(ray1 * ray2, -1) / (
        jnp.linalg.norm(ray1, axis=-1) * jnp.linalg.norm(ray2, axis=-1)
    ).clip(1e-12)
    good = (
        valid
        & (z1 > 0)
        & (z2 > 0)
        & (c1 < CHI2_2D * 2)
        & (c2 < CHI2_2D * 2)
        & (cosp < 0.99998)
    )
    # representative parallax: ~the 50th best cos (ORB-SLAM uses min over top50)
    cosp_good = jnp.where(good, cosp, 1.0)
    parallax_cos = jnp.percentile(cosp_good, 10.0)
    return good, X, parallax_cos


@jax.jit
def reconstruct_two_view(
    model: TwoViewModel,
    uv1: jnp.ndarray,
    uv2: jnp.ndarray,
    valid: jnp.ndarray,
    sigma2: jnp.ndarray,
    cam1: CameraParams,
    cam2: CameraParams,
    min_triangulated: jnp.ndarray = 50,
    min_parallax_deg: jnp.ndarray = 1.0,
) -> Reconstruction:
    """Select H vs F (ratio 0.40 as ORB-SLAM/reference) and recover motion."""
    ratio_h = model.score_h / (model.score_h + model.score_f).clip(1e-9)
    use_h = ratio_h > 0.40

    K1, K2 = cam1.K, cam2.K
    E = K2.T @ model.F @ K1
    Rs_e, ts_e = _candidate_poses_from_E(E)
    H_cal = jnp.linalg.inv(K2) @ model.H @ K1
    Rs_h, ts_h = _candidate_poses_from_H(H_cal)
    Rs = jnp.concatenate([Rs_e, Rs_h])  # (12, 3, 3)
    ts = jnp.concatenate([ts_e, ts_h])
    # only score candidates of the selected family
    fam_ok = jnp.concatenate(
        [jnp.full((4,), ~use_h), jnp.full((8,), use_h)]
    )
    inliers = jnp.where(use_h, model.inliers_h, model.inliers_f) & valid

    goods, Xs, pcs = jax.vmap(
        lambda R, t: _check_pose(R, t, uv1, uv2, inliers, cam1, cam2, sigma2)
    )(Rs, ts)
    n_goods = jnp.where(fam_ok, jnp.sum(goods, -1), -1)
    best = jnp.argmax(n_goods)
    n_best = n_goods[best]
    # winner must dominate: second best < 0.75 * best (ORB-SLAM secondBestGood)
    n_sorted = jnp.sort(n_goods)
    second = n_sorted[-2]
    parallax_ok = pcs[best] < jnp.cos(jnp.deg2rad(min_parallax_deg))
    ok = (
        (n_best >= min_triangulated)
        & (second.astype(jnp.float32) < 0.9 * n_best.astype(jnp.float32))
        & parallax_ok
    )
    return Reconstruction(
        ok=ok,
        pose_21=se3_from_Rt(Rs[best], ts[best]),
        points=Xs[best],
        point_ok=goods[best],
        n_good=n_best,
    )
