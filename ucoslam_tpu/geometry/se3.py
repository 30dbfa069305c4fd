"""SO(3) / SE(3) operations, batched and differentiable.

Counterpart of the reference's `se3` 6-float pose type (se3.h:29-207) and the
Lie-group machinery inside g2o (`SE3Quat::exp`). Poses are stored as 4x4
row-major float32 matrices mapping *frame -> global* or *global -> frame*
depending on context (the reference's `pose_f2g` maps global -> frame
camera coordinates; we keep the same convention and name).

Tangent convention: xi = [rho(3), phi(3)] — translation part first, rotation
second (Sophus convention), exp(xi) = [[exp(phi), V(phi) rho], [0, 1]].

All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _hat(phi: jnp.ndarray) -> jnp.ndarray:
    """so(3) hat operator. phi: (..., 3) -> (..., 3, 3)."""
    x, y, z = phi[..., 0], phi[..., 1], phi[..., 2]
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        -2,
    )


def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) -> (..., 3, 3). Safe at phi -> 0."""
    theta2 = jnp.sum(phi * phi, -1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = _hat(phi)
    KK = K @ K
    a = jnp.sin(theta) / theta
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    # Taylor fallbacks near zero keep gradients finite.
    a = jnp.where(theta2 < _EPS, 1.0 - theta2 / 6.0, a)
    b = jnp.where(theta2 < _EPS, 0.5 - theta2 / 24.0, b)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + a[..., None, None] * K + b[..., None, None] * KK


def so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 3). Inverse of so3_exp for theta in [0, pi).

    theta comes from atan2(|vee(R - R^T)|/2, (tr-1)/2) rather than arccos:
    arccos has an infinite derivative at theta -> 0, which poisons autodiff
    through log at (near-)identity (the pose-graph Jacobians differentiate
    through here at convergence).
    """
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_t = ((trace - 1.0) * 0.5).clip(-1.0, 1.0)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    )
    sin_t = 0.5 * jnp.sqrt(jnp.sum(w * w, -1) + _EPS * _EPS)
    theta = jnp.arctan2(sin_t, cos_t)
    scale = jnp.where(theta < 1e-4, 0.5 + theta * theta / 12.0, theta / (2.0 * sin_t.clip(_EPS)))
    # Near theta = pi the vee formula degenerates; use the diagonal route.
    near_pi = theta > 3.0
    diag = jnp.stack([R[..., 0, 0], R[..., 1, 1], R[..., 2, 2]], -1)
    axis_sq = ((diag - cos_t[..., None]) / (1.0 - cos_t[..., None]).clip(_EPS)).clip(0.0, 1.0)
    axis = jnp.sqrt(axis_sq)
    # Resolve signs from the off-diagonal sums.
    sgn = jnp.stack(
        [
            jnp.sign(R[..., 2, 1] - R[..., 1, 2]),
            jnp.sign(R[..., 0, 2] - R[..., 2, 0]),
            jnp.sign(R[..., 1, 0] - R[..., 0, 1]),
        ],
        -1,
    )
    # Where a sign is 0 (w component vanishes at pi), fall back to products.
    sgn = jnp.where(sgn == 0, 1.0, sgn)
    log_pi = axis * sgn * theta[..., None]
    return jnp.where(near_pi[..., None], log_pi, w * scale[..., None])


def _left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """V(phi): integrates translation under rotation. (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(phi * phi, -1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = _hat(phi)
    KK = K @ K
    b = (1.0 - jnp.cos(theta)) / theta2.clip(_EPS * _EPS)
    c = (theta - jnp.sin(theta)) / (theta2 * theta).clip(_EPS * _EPS * _EPS)
    b = jnp.where(theta2 < _EPS, 0.5 - theta2 / 24.0, b)
    c = jnp.where(theta2 < _EPS, 1.0 / 6.0 - theta2 / 120.0, c)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye + b[..., None, None] * K + c[..., None, None] * KK


def _left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    theta2 = jnp.sum(phi * phi, -1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = _hat(phi)
    KK = K @ K
    half = theta * 0.5
    cot = jnp.where(theta < 1e-4, 1.0 / 12.0 + theta2 / 720.0,
                    (1.0 - half * jnp.cos(half) / jnp.sin(half).clip(_EPS)) / theta2.clip(_EPS * _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot[..., None, None] * KK


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """xi = [rho, phi] (..., 6) -> (..., 4, 4)."""
    rho, phi = xi[..., :3], xi[..., 3:]
    R = so3_exp(phi)
    t = (_left_jacobian(phi) @ rho[..., None])[..., 0]
    return se3_from_Rt(R, t)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """(..., 4, 4) -> (..., 6) = [rho, phi]."""
    phi = so3_log(T[..., :3, :3])
    rho = (_left_jacobian_inv(phi) @ T[..., :3, 3:4])[..., 0]
    return jnp.concatenate([rho, phi], -1)


def se3_from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(jnp.broadcast_to(R, batch + (3, 3)))
    T = T.at[..., :3, 3].set(jnp.broadcast_to(t, batch + (3,)))
    T = T.at[..., 3, 3].set(1.0)
    return T


def se3_identity(batch: tuple = (), dtype=jnp.float32) -> jnp.ndarray:
    return jnp.broadcast_to(jnp.eye(4, dtype=dtype), tuple(batch) + (4, 4))


def se3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return se3_from_Rt(Rt, -(Rt @ t[..., None])[..., 0])


def se3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def se3_apply(T: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if X.ndim >= 2 and X.shape[-2] != 3:
        return X @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    return (R @ X[..., None])[..., 0] + t
