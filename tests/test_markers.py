"""Marker subsystem tests: IPPE solver + detectors."""

import numpy as np
import jax.numpy as jnp
import pytest

from ucoslam_tpu.geometry import CameraParams, se3_exp
from ucoslam_tpu.markers import ippe_square_poses
from ucoslam_tpu.markers.ippe import marker_object_points
from ucoslam_tpu.markers.detector import ArucoDetector, SyntheticMarkerDetector

RNG = np.random.default_rng(71)
CAM = CameraParams.create(500.0, 500.0, 320.0, 240.0)


def project_marker(T_m2c, size):
    obj = np.asarray(marker_object_points(jnp.float32(size)))
    pts = obj @ np.asarray(T_m2c)[:3, :3].T + np.asarray(T_m2c)[:3, 3]
    return np.asarray(CAM.project(jnp.asarray(pts)))


def rot_err_deg(Ra, Rb):
    c = (np.trace(Ra.T @ Rb) - 1) / 2
    return np.degrees(np.arccos(np.clip(c, -1, 1)))


class TestIPPE:
    def test_recovers_pose_batch(self):
        n = 16
        size = 0.5
        Ts, corners = [], []
        for i in range(n):
            xi = np.concatenate([
                RNG.uniform(-1.0, 1.0, 2), [0.0], RNG.uniform(-0.5, 0.5, 3)
            ]).astype(np.float32)
            T = np.asarray(se3_exp(jnp.asarray(xi))).copy()
            T[2, 3] += 4.0  # in front of the camera
            Ts.append(T)
            corners.append(project_marker(T, size))
        p1, p2, e1, e2 = ippe_square_poses(
            jnp.asarray(np.stack(corners).astype(np.float32)),
            jnp.full(n, size), CAM,
        )
        for i in range(n):
            Ra = np.asarray(p1[i])[:3, :3]
            ta = np.asarray(p1[i])[:3, 3]
            err_r = rot_err_deg(Ra, Ts[i][:3, :3])
            err_t = np.linalg.norm(ta - Ts[i][:3, 3])
            assert err_r < 2.0, f"marker {i}: rot err {err_r} deg"
            assert err_t < 0.05, f"marker {i}: t err {err_t}"
            assert float(e1[i]) < 1e-3

    def test_ambiguity_ratio_low_for_frontal_small(self):
        """A distant frontal marker is ambiguous: err ratio ~ 1."""
        T = np.eye(4, dtype=np.float32)
        T[2, 3] = 20.0
        corners = project_marker(T, 0.2)
        p1, p2, e1, e2 = ippe_square_poses(
            jnp.asarray(corners[None].astype(np.float32)), jnp.asarray([0.2]), CAM
        )
        ratio = float(e2[0] / max(float(e1[0]), 1e-12))
        assert ratio < 3.0  # ambiguous => must NOT pass the validity gate

    def test_ambiguity_ratio_high_for_tilted_close(self):
        xi = np.asarray([0.3, 0.1, 0.0, 0.7, 0.2, 0.0], np.float32)  # strong tilt
        T = np.asarray(se3_exp(jnp.asarray(xi))).copy()
        T[2, 3] += 2.0
        corners = project_marker(T, 0.5)
        p1, p2, e1, e2 = ippe_square_poses(
            jnp.asarray(corners[None].astype(np.float32)), jnp.asarray([0.5]), CAM
        )
        ratio = float(e2[0] / max(float(e1[0]), 1e-9))
        assert ratio > 3.0, f"expected unambiguous, ratio {ratio}"


class TestSyntheticDetector:
    def test_detects_visible_markers(self):
        g2m = np.eye(4, dtype=np.float32)
        g2m[:3, 3] = [0.0, 0.0, 5.0]
        det = SyntheticMarkerDetector({7: g2m}, marker_size=0.5)
        mk = det.detect_at_pose(np.eye(4, dtype=np.float32), CAM)
        assert bool(mk.valid[0])
        assert int(mk.id[0]) == 7
        # recovered IPPE pose should match g2m (camera at origin)
        err = rot_err_deg(np.asarray(mk.pose1[0])[:3, :3], g2m[:3, :3])
        assert err < 2.0

    def test_behind_camera_invisible(self):
        g2m = np.eye(4, dtype=np.float32)
        g2m[:3, 3] = [0.0, 0.0, -5.0]
        det = SyntheticMarkerDetector({3: g2m}, marker_size=0.5)
        mk = det.detect_at_pose(np.eye(4, dtype=np.float32), CAM)
        assert not bool(mk.valid.any())


class TestCv2Detector:
    def test_detects_rendered_marker(self):
        cv2 = pytest.importorskip("cv2")
        import cv2.aruco as aruco

        d = aruco.getPredefinedDictionary(aruco.DICT_ARUCO_MIP_36h12)
        marker_img = aruco.generateImageMarker(d, 17, 120)
        img = np.full((480, 640), 180, np.uint8)
        img[100:220, 200:320] = marker_img
        det = ArucoDetector("ARUCO_MIP_36h12", marker_size=0.3)
        assert det.available
        mk = det.detect(img.astype(np.float32), CAM)
        assert bool(np.asarray(mk.valid).any())
        ids = np.asarray(mk.id)[np.asarray(mk.valid)]
        assert 17 in ids
        # corners near the pasted location
        c = np.asarray(mk.corners)[0]
        assert c[:, 0].min() > 190 and c[:, 0].max() < 330
        assert c[:, 1].min() > 90 and c[:, 1].max() < 230
