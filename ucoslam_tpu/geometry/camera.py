"""Pinhole camera model with radial-tangential distortion.

Counterpart of the reference `ImageParams` (src/imageparams.h:27-122): K
intrinsics, 5-coefficient OpenCV distortion (k1, k2, p1, p2, k3), image
size, stereo baseline `bl`, RGB-D `rgb_depthscale`, and the
`isClosePoint(z < 40 * bl)` stereo gate (imageparams.h:105).

Distort is the closed form; undistort inverts it with a fixed-point
iteration (jit-friendly, no dynamic control flow).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np


class CameraParams(NamedTuple):
    """Static per-camera parameters, usable inside jit as array leaves."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # (5,) = k1, k2, p1, p2, k3
    width: int = 640
    height: int = 480
    bl: float = 0.0  # stereo baseline (meters); 0 => monocular
    rgb_depthscale: float = 1.0 / 5000.0  # TUM convention depth_png/5000 = meters

    @classmethod
    def create(cls, fx, fy, cx, cy, dist=None, width=640, height=480, bl=0.0,
               rgb_depthscale=1.0 / 5000.0) -> "CameraParams":
        dist = np.zeros(5, np.float32) if dist is None else np.asarray(dist, np.float32)
        if dist.shape[0] < 5:
            dist = np.pad(dist, (0, 5 - dist.shape[0]))
        return cls(
            jnp.float32(fx), jnp.float32(fy), jnp.float32(cx), jnp.float32(cy),
            jnp.asarray(dist[:5], jnp.float32), int(width), int(height), float(bl),
            float(rgb_depthscale),
        )

    # -- core maps ------------------------------------------------------
    @property
    def K(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [
                jnp.stack([self.fx, z, self.cx], -1),
                jnp.stack([z, self.fy, self.cy], -1),
                jnp.stack([z, z, o], -1),
            ],
            -2,
        )

    @property
    def bf(self) -> jnp.ndarray:
        """baseline * fx, the stereo disparity scale (ref: frameextractor.cpp:2595)."""
        return self.fx * self.bl

    def has_distortion(self) -> bool:
        return bool(np.any(np.abs(np.asarray(self.dist)) > 0))

    def project(self, xyz: jnp.ndarray) -> jnp.ndarray:
        """Camera-frame 3D points (..., 3) -> undistorted pixels (..., 2).

        Matches the reference's fast project (misc.h:111, frame.h:140):
        projection operates in the *undistorted* pixel domain.
        """
        z = xyz[..., 2:3]
        inv_z = 1.0 / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        x = xyz[..., 0:1] * inv_z
        y = xyz[..., 1:2] * inv_z
        return jnp.concatenate([self.fx * x + self.cx, self.fy * y + self.cy], -1)

    def unproject(self, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
        """Undistorted pixels (..., 2) + depth (...,) -> camera-frame (..., 3)."""
        x = (uv[..., 0] - self.cx) / self.fx
        y = (uv[..., 1] - self.cy) / self.fy
        return jnp.stack([x * depth, y * depth, depth], -1)

    def distort_normalized(self, xy: jnp.ndarray) -> jnp.ndarray:
        """Apply OpenCV radtan distortion to normalized coords (..., 2)."""
        k1, k2, p1, p2, k3 = (self.dist[i] for i in range(5))
        x, y = xy[..., 0], xy[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        return jnp.stack([xd, yd], -1)

    def undistort_points(self, uv: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
        """Distorted pixels (..., 2) -> undistorted pixels (..., 2).

        Fixed-point iteration of the inverse distortion (same method as
        cv::undistortPoints); `iters` static for jit.
        """
        xn = jnp.stack(
            [(uv[..., 0] - self.cx) / self.fx, (uv[..., 1] - self.cy) / self.fy], -1
        )
        x = xn
        k1, k2, p1, p2, k3 = (self.dist[i] for i in range(5))
        for _ in range(iters):
            xs, ys = x[..., 0], x[..., 1]
            r2 = xs * xs + ys * ys
            radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
            dx = 2.0 * p1 * xs * ys + p2 * (r2 + 2.0 * xs * xs)
            dy = p1 * (r2 + 2.0 * ys * ys) + 2.0 * p2 * xs * ys
            x = (xn - jnp.stack([dx, dy], -1)) / radial[..., None]
        return jnp.stack([x[..., 0] * self.fx + self.cx, x[..., 1] * self.fy + self.cy], -1)

    def distort_points(self, uv_und: jnp.ndarray) -> jnp.ndarray:
        """Undistorted pixels -> distorted pixels (forward model)."""
        xy = jnp.stack(
            [(uv_und[..., 0] - self.cx) / self.fx, (uv_und[..., 1] - self.cy) / self.fy], -1
        )
        xyd = self.distort_normalized(xy)
        return jnp.stack(
            [xyd[..., 0] * self.fx + self.cx, xyd[..., 1] * self.fy + self.cy], -1
        )

    def is_close_point(self, z: jnp.ndarray) -> jnp.ndarray:
        """Stereo near-field gate: z < 40 * baseline (ref imageparams.h:105)."""
        return z < 40.0 * self.bl

    def in_image(self, uv: jnp.ndarray, margin: float = 0.0) -> jnp.ndarray:
        return (
            (uv[..., 0] >= margin)
            & (uv[..., 0] < self.width - margin)
            & (uv[..., 1] >= margin)
            & (uv[..., 1] < self.height - margin)
        )

    def scaled(self, factor: float) -> "CameraParams":
        """Camera for an image resized by `factor` (ref kptImageScaleFactor)."""
        return self._replace(
            fx=self.fx * factor,
            fy=self.fy * factor,
            cx=self.cx * factor,
            cy=self.cy * factor,
            width=int(round(self.width * factor)),
            height=int(round(self.height * factor)),
        )
