"""Stereo rectification: epipolar rows align after rectification."""

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.geometry import CameraParams, se3_apply
from ucoslam_tpu.geometry.se3 import so3_exp
from ucoslam_tpu.io.stereorectify import StereoRectify

RNG = np.random.default_rng(101)


def setup_rig():
    """Verged stereo rig: right camera rotated a few degrees + offset."""
    cam_l = CameraParams.create(460.0, 460.0, 320.0, 240.0,
                                dist=[0.05, -0.1, 0.001, -0.001, 0.0])
    cam_r = CameraParams.create(455.0, 455.0, 315.0, 242.0,
                                dist=[0.04, -0.08, -0.001, 0.001, 0.0])
    R = np.asarray(so3_exp(jnp.asarray([0.01, -0.03, 0.005])))
    T = np.asarray([-0.11, 0.002, -0.004])
    return cam_l, cam_r, R, T


def test_rectified_rows_align():
    cam_l, cam_r, R, T = setup_rig()
    sr = StereoRectify(cam_l, cam_r, R, T)
    cam = sr.rectified_camera()
    assert abs(cam.bl - np.linalg.norm(T)) < 1e-6

    # world points in front of the rig
    X = RNG.uniform(-1, 1, (200, 3)).astype(np.float32)
    X[:, 2] = RNG.uniform(2, 8, 200)
    # project through RECTIFIED cameras: left at [R1 | 0], right at
    # [R2 | t'] with t' = -baseline along x
    R1, R2 = sr.R1, sr.R2
    q_l = X @ R1.T
    q_r = (X @ R.T + T) @ R2.T
    uv_l = np.asarray(cam.project(jnp.asarray(q_l)))
    uv_r = np.asarray(cam.project(jnp.asarray(q_r)))
    dv = np.abs(uv_l[:, 1] - uv_r[:, 1])
    assert np.median(dv) < 0.2, f"row misalignment {np.median(dv)}"
    # disparity positive and consistent with depth: d = f*b/z
    disp = uv_l[:, 0] - uv_r[:, 0]
    z_rect = q_l[:, 2]
    pred = float(cam.fx) * cam.bl / z_rect
    in_img = (np.abs(uv_l[:, 0] - 320) < 300) & (np.abs(uv_l[:, 1] - 240) < 220)
    assert np.median(np.abs(disp[in_img] - pred[in_img])) < 0.5


def test_remap_warps_images():
    cam_l, cam_r, R, T = setup_rig()
    sr = StereoRectify(cam_l, cam_r, R, T)
    left = RNG.uniform(0, 255, (480, 640)).astype(np.float32)
    right = RNG.uniform(0, 255, (480, 640)).astype(np.float32)
    lr, rr = sr.rectify(left, right)
    assert lr.shape == (480, 640) and rr.shape == (480, 640)
    assert lr.std() > 30  # content preserved, not constant
