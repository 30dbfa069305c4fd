"""Stereo rectification: calibrated pair -> row-aligned rectified pair.

Counterpart of the reference StereoRectify (src/stereorectify.h:40): build
remap tables from a stereo calibration and warp both eyes so epipolar lines
become image rows (the stereo frontend then matches along rows). The
reference runs two cv::remap calls in two threads; here both remaps are one
batched bilinear gather under jit.

Rectification math is Bouguet's algorithm (as cv::stereoRectify):
split the inter-camera rotation evenly, then rotate both cameras so the
baseline becomes the common x-axis.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.geometry.se3 import so3_exp, so3_log
from ucoslam_tpu.ops.image import bilinear_sample


class StereoRectify:
    def __init__(
        self,
        cam_left: CameraParams,
        cam_right: CameraParams,
        R: np.ndarray,  # (3,3) rotation right <- left  (x_r = R x_l + T)
        T: np.ndarray,  # (3,) translation right <- left
        new_size: tuple | None = None,
    ):
        self.cam_left = cam_left
        self.cam_right = cam_right
        R = np.asarray(R, np.float64)
        T = np.asarray(T, np.float64).reshape(3)
        w = new_size[0] if new_size else cam_left.width
        h = new_size[1] if new_size else cam_left.height

        # --- Bouguet: split rotation, align baseline with +x -------------
        r_half = np.asarray(so3_log(jnp.asarray(R[None]))).reshape(3) / 2.0
        R_half = np.asarray(so3_exp(jnp.asarray(r_half[None]))).reshape(3, 3)
        # camera-1 frame after splitting: rotate left by R_half, right by R_half^-1
        t = R_half @ T  # baseline expressed in the split frame
        e1 = t / np.linalg.norm(t)
        if abs(e1[0]) < 1e-9:
            e1 = np.asarray([1.0, 0.0, 0.0])
        e2 = np.asarray([-t[1], t[0], 0.0])
        n2 = np.linalg.norm(e2)
        e2 = e2 / n2 if n2 > 1e-12 else np.asarray([0.0, 1.0, 0.0])
        e3 = np.cross(e1, e2)
        Rrect = np.stack([e1, e2, e3])  # rows
        if e1[0] < 0:
            Rrect[0] *= -1.0
            Rrect[2] *= -1.0
        self.R1 = (Rrect @ R_half).astype(np.float32)  # left cam -> rectified
        self.R2 = (Rrect @ R_half.T).astype(np.float32)  # right cam -> rectified
        self.baseline = float(np.linalg.norm(T))

        f = float(0.5 * (float(cam_left.fy) + float(cam_right.fy)))
        cx = w / 2.0
        cy = h / 2.0
        self.cam_rect = CameraParams.create(
            f, f, cx, cy, dist=None, width=w, height=h, bl=self.baseline,
        )
        self._maps = {}

    # ------------------------------------------------------------------
    def _remap_grid(self, which: str):
        """(H, W, 2) source pixel coordinates for the rectified grid."""
        if which in self._maps:
            return self._maps[which]
        cam = self.cam_left if which == "left" else self.cam_right
        Ri = self.R1 if which == "left" else self.R2
        h, w = self.cam_rect.height, self.cam_rect.width
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
        # rectified pixel -> normalized ray in rectified frame
        xr = (xs - float(self.cam_rect.cx)) / float(self.cam_rect.fx)
        yr = (ys - float(self.cam_rect.cy)) / float(self.cam_rect.fy)
        rays = np.stack([xr, yr, np.ones_like(xr)], -1)  # (h, w, 3)
        # into the original camera frame
        rays_cam = rays @ Ri  # == R_i^T applied to each ray
        xn = rays_cam[..., 0] / rays_cam[..., 2]
        yn = rays_cam[..., 1] / rays_cam[..., 2]
        # apply the source camera's distortion + intrinsics
        xy = jnp.stack([jnp.asarray(xn), jnp.asarray(yn)], -1)
        xyd = cam.distort_normalized(xy)
        u = xyd[..., 0] * cam.fx + cam.cx
        v = xyd[..., 1] * cam.fy + cam.cy
        grid = jnp.stack([u, v], -1)
        self._maps[which] = grid
        return grid

    @staticmethod
    @jax.jit
    def _remap(img: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
        return bilinear_sample(img, grid, mode="bilinear")

    def rectify(self, left, right):
        """(left, right) raw -> (left_rect, right_rect) float32 images."""
        gl = self._remap_grid("left")
        gr = self._remap_grid("right")
        return (
            np.asarray(self._remap(jnp.asarray(left, jnp.float32), gl)),
            np.asarray(self._remap(jnp.asarray(right, jnp.float32), gr)),
        )

    def rectified_camera(self) -> CameraParams:
        return self.cam_rect
