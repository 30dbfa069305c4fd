"""Headless-capable map viewer.

Counterpart of the reference MapViewer/MapDrawer (src/mapviewer.h:18-765):
the reference renders with its in-repo `sgl` software rasterizer and an
optional cv::imshow window; harnesses drive it through a string `set()`
interface (tests/test_sequence.cpp:141-151). Here: a minimal software
renderer (points + keyframe frusta projected through a virtual camera) onto
a numpy canvas, an identical `set()` string interface, optional cv2 window
when a display exists, and `snapshot()` for headless use.
"""

from __future__ import annotations

import numpy as np

from ucoslam_tpu.mapping.map import Map


class MapViewer:
    def __init__(self, width: int = 960, height: int = 720):
        self.width = width
        self.height = height
        self.options: dict[str, str] = {
            "followCamera": "1",
            "mode": "0",
            "showNumbers": "0",
            "drawCovisGraph": "0",
        }
        self._window = False

    def set(self, key: str, value: str) -> None:
        """String-option interface (mapviewer.h:502 `set`)."""
        self.options[str(key)] = str(value)

    # ------------------------------------------------------------------
    def _view_pose(self, pose_f2g: np.ndarray | None) -> np.ndarray:
        """Virtual viewing camera: slightly behind/above the SLAM camera."""
        if pose_f2g is None or self.options.get("followCamera") != "1":
            T = np.eye(4, dtype=np.float32)
            T[2, 3] = 6.0
            return T
        offset = np.eye(4, dtype=np.float32)
        offset[:3, 3] = [0.0, -0.6, 1.5]
        return offset @ pose_f2g

    def snapshot(
        self, world_map: Map, pose_f2g: np.ndarray | None = None
    ) -> np.ndarray:
        """Render the map to an (H, W, 3) uint8 image."""
        canvas = np.zeros((self.height, self.width, 3), np.uint8)
        canvas[:] = 24
        T = self._view_pose(pose_f2g)
        f = 0.8 * self.width
        cx, cy = self.width / 2.0, self.height / 2.0

        def project(pts):
            q = pts @ T[:3, :3].T + T[:3, 3]
            z = q[:, 2]
            ok = z > 0.1
            u = f * q[:, 0] / np.where(ok, z, 1.0) + cx
            v = f * q[:, 1] / np.where(ok, z, 1.0) + cy
            ok &= (u >= 0) & (u < self.width - 1) & (v >= 0) & (v < self.height - 1)
            return u.astype(int), v.astype(int), ok

        st = world_map.state
        pts = np.asarray(st.pt_pos)[np.asarray(st.pt_active)]
        if len(pts):
            u, v, ok = project(pts)
            canvas[v[ok], u[ok]] = (90, 200, 90)

        kf_act = np.asarray(st.kf_active)
        kf_poses = np.asarray(st.kf_pose)[kf_act]
        centers = np.stack(
            [-P[:3, :3].T @ P[:3, 3] for P in kf_poses]
        ) if len(kf_poses) else np.zeros((0, 3))
        if len(centers):
            u, v, ok = project(centers)
            for x, y in zip(u[ok], v[ok]):
                canvas[max(0, y - 2) : y + 3, max(0, x - 2) : x + 3] = (80, 120, 240)

        mk_act = np.asarray(st.mk_active) & np.asarray(st.mk_pose_valid)
        mk_poses = np.asarray(st.mk_pose)[mk_act]
        if len(mk_poses):
            u, v, ok = project(mk_poses[:, :3, 3])
            for x, y in zip(u[ok], v[ok]):
                canvas[max(0, y - 3) : y + 4, max(0, x - 3) : x + 4] = (60, 60, 230)

        if pose_f2g is not None:
            c = (-pose_f2g[:3, :3].T @ pose_f2g[:3, 3])[None]
            u, v, ok = project(c)
            if ok.any():
                canvas[
                    max(0, v[0] - 3) : v[0] + 4, max(0, u[0] - 3) : u[0] + 4
                ] = (0, 255, 255)
        return canvas

    def show(
        self,
        world_map: Map,
        image: np.ndarray | None = None,
        pose_f2g: np.ndarray | None = None,
        message: str = "",
        wait_ms: int = 1,
    ) -> int:
        """Render; open a cv2 window when a display exists. Returns keycode
        (the reference returns the pressed key; headless always 255)."""
        canvas = self.snapshot(world_map, pose_f2g)
        try:
            import os

            if not os.environ.get("DISPLAY"):
                return 255
            import cv2

            cv2.imshow("ucoslam_tpu map", canvas)
            return cv2.waitKey(wait_ms) & 0xFF
        except Exception:
            return 255
