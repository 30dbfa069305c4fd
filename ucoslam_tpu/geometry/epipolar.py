"""Epipolar geometry helpers.

Counterpart of the reference `computeF12` and `epipolarLineSqDist`
(misc.h:71-80) used by FrameMatcher::matchEpipolar (framematcher.cpp:261,456)
with the chi2(1 dof) = 3.84 sigma^2 gate.
"""

from __future__ import annotations

import jax.numpy as jnp

from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.geometry.se3 import _hat


def essential_from_relative(T_21: jnp.ndarray) -> jnp.ndarray:
    """E = [t]x R for relative pose mapping cam1 coords -> cam2 coords."""
    R = T_21[..., :3, :3]
    t = T_21[..., :3, 3]
    return _hat(t) @ R


def fundamental_from_poses(
    T1_g2c: jnp.ndarray, T2_g2c: jnp.ndarray, cam1: CameraParams, cam2: CameraParams
) -> jnp.ndarray:
    """F12 such that x2^T F x1 = 0 for undistorted pixel coords.

    Matches the reference computeF12 (framematcher.cpp:48, misc.h).
    """
    T_21 = T2_g2c @ jnp.linalg.inv(T1_g2c)
    E = essential_from_relative(T_21)
    K1i = jnp.linalg.inv(cam1.K)
    K2i = jnp.linalg.inv(cam2.K)
    return jnp.swapaxes(K2i, -1, -2) @ E @ K1i


def epipolar_line_sq_dist(F12: jnp.ndarray, uv1: jnp.ndarray, uv2: jnp.ndarray) -> jnp.ndarray:
    """Squared distance of x2 to the epipolar line of x1 (ref misc.h:71-80).

    uv1: (..., N, 2) points in image 1; uv2: (..., M, 2) points in image 2.
    Returns (..., N, M).
    """
    ones1 = jnp.ones(uv1.shape[:-1] + (1,), uv1.dtype)
    x1 = jnp.concatenate([uv1, ones1], -1)  # (..., N, 3)
    lines = x1 @ jnp.swapaxes(F12, -1, -2)  # (..., N, 3): l = F x1
    a, b, c = lines[..., 0:1], lines[..., 1:2], lines[..., 2:3]
    # distance^2 = (a u2 + b v2 + c)^2 / (a^2 + b^2)
    u2 = uv2[..., None, :, 0]  # (..., 1, M)
    v2 = uv2[..., None, :, 1]
    val = a * u2 + b * v2 + c  # (..., N, M)
    denom = (a * a + b * b).clip(1e-12)
    return val * val / denom
