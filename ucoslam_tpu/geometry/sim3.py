"""Sim(3) operations for loop-closure pose-graph relaxation.

Counterpart of g2o's `Sim3` type used by the reference pose graph
(3rdparty/g2o/g2o/types/sim3/sim3.h:36, consumed by graphoptsim3.cpp:74-168).

Representation: a Sim3 element is the tuple (s, R, t) packed as a dict-free
(..., 8) array [t(3), phi_as_R? no] — we instead carry explicit (R, t, s)
triples packed into a (..., 4, 4) matrix with the rotation block scaled:
T = [[s*R, t], [0, 1]]. Tangent: zeta = [rho(3), phi(3), sigma(1)] (..., 7).
"""

from __future__ import annotations

import jax.numpy as jnp

from ucoslam_tpu.geometry.se3 import _hat, so3_exp, so3_log, _EPS


def sim3_from_sRt(s: jnp.ndarray, R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    batch = jnp.broadcast_shapes(jnp.shape(s), R.shape[:-2], t.shape[:-1])
    T = jnp.zeros(batch + (4, 4), dtype=R.dtype)
    T = T.at[..., :3, :3].set(jnp.asarray(s)[..., None, None] * R)
    T = T.at[..., :3, 3].set(jnp.broadcast_to(t, batch + (3,)))
    T = T.at[..., 3, 3].set(1.0)
    return T


def sim3_scale(T: jnp.ndarray) -> jnp.ndarray:
    """Recover s from the scaled rotation block (det = s^3)."""
    sR = T[..., :3, :3]
    return jnp.cbrt(jnp.linalg.det(sR))


def sim3_parts(T: jnp.ndarray):
    s = sim3_scale(T)
    R = T[..., :3, :3] / s[..., None, None]
    t = T[..., :3, 3]
    return s, R, t


def sim3_inverse(T: jnp.ndarray) -> jnp.ndarray:
    s, R, t = sim3_parts(T)
    Rt = jnp.swapaxes(R, -1, -2)
    s_inv = 1.0 / s
    t_inv = -s_inv[..., None] * (Rt @ t[..., None])[..., 0]
    return sim3_from_sRt(s_inv, Rt, t_inv)


def sim3_compose(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    return A @ B


def sim3_apply(T: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    sR = T[..., :3, :3]
    t = T[..., :3, 3]
    if X.ndim >= 2 and X.shape[-2] != 3:
        return X @ jnp.swapaxes(sR, -1, -2) + t[..., None, :]
    return (sR @ X[..., None])[..., 0] + t


def sim3_exp(zeta: jnp.ndarray) -> jnp.ndarray:
    """zeta = [rho(3), phi(3), sigma] (..., 7) -> (..., 4, 4) Sim3.

    t = W(phi, sigma) rho with W per Strasdat, "Local Accuracy and Global
    Consistency for Efficient Visual SLAM" (App. B).
    """
    rho, phi, sigma = zeta[..., :3], zeta[..., 3:6], zeta[..., 6]
    R = so3_exp(phi)
    s = jnp.exp(sigma)
    W = _sim3_W(zeta)
    t = (W @ rho[..., None])[..., 0]
    return sim3_from_sRt(s, R, t)


def sim3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Inverse of sim3_exp via solving W rho = t. (..., 4, 4) -> (..., 7)."""
    s, R, t = sim3_parts(T)
    phi = so3_log(R)
    sigma = jnp.log(s)
    # Rebuild W with the same coefficients and solve for rho.
    zeta_rot = jnp.concatenate([jnp.zeros_like(phi), phi, sigma[..., None]], -1)
    W = _sim3_W(zeta_rot)
    rho = jnp.linalg.solve(W, t[..., None])[..., 0]
    return jnp.concatenate([rho, phi, sigma[..., None]], -1)


def _sim3_W(zeta: jnp.ndarray) -> jnp.ndarray:
    """W coefficient matrix used by sim3_exp (extracted for log)."""
    phi, sigma = zeta[..., 3:6], zeta[..., 6]
    theta2 = jnp.sum(phi * phi, -1)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = _hat(phi)
    KK = K @ K
    es = jnp.exp(sigma)
    sig = sigma
    small_sig = jnp.abs(sig) < 1e-5
    small_th = theta < 1e-5
    C = jnp.where(small_sig, 1.0 + sig / 2.0, (es - 1.0) / jnp.where(small_sig, 1.0, sig))
    denom = (sig * sig + theta2).clip(_EPS)
    A_gen = (sig * es * jnp.sin(theta) + (1.0 - es * jnp.cos(theta)) * theta) / (
        theta.clip(_EPS) * denom
    )
    B_gen = (C - ((es * jnp.cos(theta) - 1.0) * sig + es * jnp.sin(theta) * theta) / denom) / theta2.clip(_EPS)
    A_small = jnp.where(
        small_sig, 0.5 + sig / 3.0, (sig * es - es + 1.0) / jnp.where(small_sig, 1.0, sig * sig)
    )
    B_small = jnp.where(
        small_sig, 1.0 / 6.0 + sig / 8.0,
        (es * (0.5 * sig * sig - sig + 1.0) - 1.0) / jnp.where(small_sig, 1.0, sig * sig * sig),
    )
    A_f = jnp.where(small_th, A_small, A_gen)
    B_f = jnp.where(small_th, B_small, B_gen)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=zeta.dtype), K.shape)
    return C[..., None, None] * eye + A_f[..., None, None] * K + B_f[..., None, None] * KK
