"""IPPE: Infinitesimal Plane-based Pose Estimation for square markers.

Counterpart of the reference IPPE (src/optimization/ippe.{h:19-131,cpp:526},
Collins & Bartoli IJCV 2014): a homography from the 4 marker corners yields
TWO analytic pose solutions with their reprojection errors; the ratio
err2/err1 expresses the planar-pose ambiguity and gates marker-based
initialization (aruco_minerrratio_valid, ucoslamtypes.h:144).

Fully closed-form and vmapped over markers — no iterative PnP per marker.
Corner order convention (ArUco): TL, TR, BR, BL; marker frame: x right,
y up, z out of the plane, centered — get3DPoints (marker.h:44-47).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ucoslam_tpu.geometry.camera import CameraParams


def marker_object_points(size: jnp.ndarray) -> jnp.ndarray:
    """(4, 3) corner coordinates in the marker frame (TL, TR, BR, BL)."""
    h = size / 2.0
    z = jnp.zeros_like(h)
    return jnp.stack(
        [
            jnp.stack([-h, h, z], -1),
            jnp.stack([h, h, z], -1),
            jnp.stack([h, -h, z], -1),
            jnp.stack([-h, -h, z], -1),
        ],
        -2,
    )


def _homography_4pt(src: jnp.ndarray, dst: jnp.ndarray) -> jnp.ndarray:
    """Exact homography (3, 3) from 4 correspondences (no normalization;
    inputs are already metric/normalized-camera scale)."""
    s = src.shape[0]
    u1 = jnp.concatenate([src, jnp.ones((s, 1))], -1)
    zeros = jnp.zeros((s, 3))
    x2, y2 = dst[:, 0:1], dst[:, 1:2]
    rows1 = jnp.concatenate([zeros, -u1, y2 * u1], -1)
    rows2 = jnp.concatenate([u1, zeros, -x2 * u1], -1)
    A = jnp.concatenate([rows1, rows2], 0)
    _, vecs = jnp.linalg.eigh(A.T @ A)
    H = vecs[:, 0].reshape(3, 3)
    return H / H[2, 2]


def _rotate_vec_to_z(a: jnp.ndarray) -> jnp.ndarray:
    """Rotation R with R @ (a/|a|) = e_z (OpenCV ippe rotateVec2ZAxis)."""
    an = a / jnp.linalg.norm(a).clip(1e-12)
    ez = jnp.array([0.0, 0.0, 1.0])
    v = jnp.cross(an, ez)
    c = an[2]
    s2 = jnp.sum(v * v)
    # Rodrigues from cross/dot; near-parallel handled by the eps guard
    vx = jnp.array(
        [[0.0, -v[2], v[1]], [v[2], 0.0, -v[0]], [-v[1], v[0], 0.0]]
    )
    R = jnp.eye(3) + vx + vx @ vx * ((1.0 - c) / s2.clip(1e-12))
    return jnp.where(s2 < 1e-12, jnp.eye(3) * jnp.sign(c + 0.5), R)


def _solve_translation(R: jnp.ndarray, obj: jnp.ndarray, uv_n: jnp.ndarray) -> jnp.ndarray:
    """Least-squares t given R: rows [I | -u] (R X + t) = 0 per corner."""
    RX = obj @ R.T  # (4, 3)
    u = uv_n[:, 0]
    v = uv_n[:, 1]
    ones = jnp.ones_like(u)
    zeros = jnp.zeros_like(u)
    # per-corner 2x3 coefficient block [1 0 -u; 0 1 -v]
    A_rows = jnp.stack(
        [
            jnp.stack([ones, zeros, -u], -1),
            jnp.stack([zeros, ones, -v], -1),
        ],
        -2,
    )  # (4, 2, 3)
    b_rows = -jnp.einsum("cij,cj->ci", A_rows, RX)  # (4, 2)
    A = A_rows.reshape(-1, 3)
    b = b_rows.reshape(-1)
    return jnp.linalg.solve(A.T @ A + 1e-12 * jnp.eye(3), A.T @ b)


def _reproj_err(R, t, obj, uv_n):
    q = obj @ R.T + t
    uv = q[:, :2] / q[:, 2:3].clip(1e-9)
    return jnp.sqrt(jnp.mean(jnp.sum((uv - uv_n) ** 2, -1)))


def _refine_pose(R, t, obj, uv_n, iters: int = 5):
    """Polish an IPPE solution with Gauss-Newton on the 4 corners.

    The closed form is first-order (exact only at the marker center);
    OpenCV's IPPE applies the same polish. 6-dof GN with 8 residuals.
    """
    from ucoslam_tpu.geometry.se3 import _hat, se3_exp

    T = jnp.eye(4).at[:3, :3].set(R).at[:3, 3].set(t)

    def step(T, _):
        Rc = T[:3, :3]
        tc = T[:3, 3]
        q = obj @ Rc.T + tc  # (4, 3)
        z = q[:, 2:3].clip(1e-9)
        uv = q[:, :2] / z
        r = (uv - uv_n).reshape(-1)  # (8,)
        inv_z = 1.0 / z[:, 0]
        zero = jnp.zeros_like(inv_z)
        J_proj = jnp.stack(
            [
                jnp.stack([inv_z, zero, -q[:, 0] * inv_z**2], -1),
                jnp.stack([zero, inv_z, -q[:, 1] * inv_z**2], -1),
            ],
            -2,
        )  # (4, 2, 3)
        J_pose = jnp.concatenate(
            [jnp.broadcast_to(jnp.eye(3), (4, 3, 3)), -_hat(q)], -1
        )  # (4, 3, 6)
        J = (J_proj @ J_pose).reshape(-1, 6)  # (8, 6)
        H = J.T @ J + 1e-9 * jnp.eye(6)
        delta = jnp.linalg.solve(H, J.T @ r)
        return se3_exp(-delta) @ T, None

    T, _ = jax.lax.scan(step, T, None, length=iters)
    return T[:3, :3], T[:3, 3]


def _ippe_single(uv_n: jnp.ndarray, size: jnp.ndarray):
    """Core IPPE on normalized image coords (4, 2) -> two (R, t) + errors."""
    obj = marker_object_points(size)  # (4, 3)
    H = _homography_4pt(obj[:, :2], uv_n)
    p, q = H[0, 2], H[1, 2]
    # Jacobian of the homography map at the marker center (H normalized)
    J = jnp.array(
        [
            [H[0, 0] - H[2, 0] * p, H[0, 1] - H[2, 1] * p],
            [H[1, 0] - H[2, 0] * q, H[1, 1] - H[2, 1] * q],
        ]
    )
    Rv = _rotate_vec_to_z(jnp.array([p, q, 1.0]))
    B = jnp.array(
        [
            [Rv[0, 0] - p * Rv[2, 0], Rv[0, 1] - p * Rv[2, 1]],
            [Rv[1, 0] - p * Rv[2, 0], Rv[1, 1] - p * Rv[2, 1]],
        ]
    )
    det = B[0, 0] * B[1, 1] - B[0, 1] * B[1, 0]
    Binv = jnp.array([[B[1, 1], -B[0, 1]], [-B[1, 0], B[0, 0]]]) / jnp.where(
        jnp.abs(det) < 1e-12, 1e-12, det
    )
    A = Binv @ J
    AtA = A.T @ A
    g = jnp.sqrt(
        0.5
        * (
            AtA[0, 0]
            + AtA[1, 1]
            + jnp.sqrt((AtA[0, 0] - AtA[1, 1]) ** 2 + 4.0 * AtA[0, 1] ** 2)
        )
    ).clip(1e-12)
    Rt = A / g  # "R-tilde": top-left 2x2 of the rotation (columns-scaled)
    b0 = jnp.sqrt(jnp.clip(1.0 - Rt[0, 0] ** 2 - Rt[1, 0] ** 2, 0.0))
    b1 = jnp.sqrt(jnp.clip(1.0 - Rt[0, 1] ** 2 - Rt[1, 1] ** 2, 0.0))
    sp = -(Rt[0, 0] * Rt[0, 1] + Rt[1, 0] * Rt[1, 1])
    b1 = jnp.where(sp < 0, -b1, b1)

    def build(sign):
        c1 = jnp.array([Rt[0, 0], Rt[1, 0], sign * b0])
        c2 = jnp.array([Rt[0, 1], Rt[1, 1], sign * b1])
        c3 = jnp.cross(c1, c2)
        Rp = jnp.stack([c1, c2, c3], -1)
        return Rv.T @ Rp

    R1 = build(1.0)
    R2 = build(-1.0)
    t1 = _solve_translation(R1, obj, uv_n)
    t2 = _solve_translation(R2, obj, uv_n)
    R1, t1 = _refine_pose(R1, t1, obj, uv_n)
    R2, t2 = _refine_pose(R2, t2, obj, uv_n)
    e1 = _reproj_err(R1, t1, obj, uv_n)
    e2 = _reproj_err(R2, t2, obj, uv_n)
    # order: best first
    swap = e2 < e1
    Ra = jnp.where(swap, R2, R1)
    ta = jnp.where(swap, t2, t1)
    Rb = jnp.where(swap, R1, R2)
    tb = jnp.where(swap, t1, t2)
    ea = jnp.minimum(e1, e2)
    eb = jnp.maximum(e1, e2)
    T1 = jnp.eye(4).at[:3, :3].set(Ra).at[:3, 3].set(ta)
    T2 = jnp.eye(4).at[:3, :3].set(Rb).at[:3, 3].set(tb)
    return T1, T2, ea, eb


@jax.jit
def ippe_square_poses(
    corners_und: jnp.ndarray,  # (M, 4, 2) undistorted pixel corners
    sizes: jnp.ndarray,  # (M,) marker side lengths (meters)
    cam: CameraParams,
):
    """Batched IPPE: returns (pose1 (M,4,4), pose2, err1 (M,), err2).

    Poses map marker frame -> camera frame; err_ratio = err2/err1 is the
    ambiguity measure consumed as MarkerPosesIPPE::err_ratio (marker.h:87).
    """
    uv_n = jnp.stack(
        [
            (corners_und[..., 0] - cam.cx) / cam.fx,
            (corners_und[..., 1] - cam.cy) / cam.fy,
        ],
        -1,
    )
    return jax.vmap(_ippe_single)(uv_n, sizes)
