"""Synthetic SLAM sequences with ground truth.

The reference validates against TUM/EuRoC/KITTI videos (SURVEY.md §4); those
datasets are not available in this environment, so tests and benches use
synthetic sequences with exact ground truth:

- `oracle` mode emits ready-made `Frame`s: keypoints are projections of a
  persistent 3D blob cloud, each blob carrying a stable random 256-bit
  descriptor observed with a few flipped bits — this isolates the SLAM
  pipeline from the image frontend.
- `render` mode draws the blobs into grayscale images for end-to-end runs
  through the real ORB extractor.

Ground-truth trajectories + ATE tooling make this the stand-in for the
reference's test_sequence/comparelogs protocol.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.geometry.se3 import se3_from_Rt
from ucoslam_tpu.mapping.frame import Frame, empty_frame


def _lookat(eye: np.ndarray, target: np.ndarray, up=np.array([0.0, -1.0, 0.0])):
    """World->camera pose looking from eye at target (right-handed, z fwd)."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(up, fwd)
    right /= np.linalg.norm(right)
    down = np.cross(fwd, right)
    R = np.stack([right, down, fwd], 0)  # rows = camera axes in world
    t = -R @ eye
    return R.astype(np.float32), t.astype(np.float32)


class SyntheticSequence:
    """A deterministic synthetic scene + trajectory.

    Scene: `n_points` blobs uniformly in a box slab; trajectory: smooth arc
    with lateral translation (enough parallax for initialization) looking at
    the cloud center.
    """

    def __init__(
        self,
        cam: CameraParams | None = None,
        n_points: int = 1200,
        n_frames: int = 60,
        n_kpt_slots: int = 512,
        noise_px: float = 0.3,
        desc_bit_flips: int = 8,
        trajectory: str = "arc",
        depth_mode: str = "mono",  # mono | stereo | rgbd
        seed: int = 0,
        motion_scale: float = 1.0,
        n_markers: int = 0,
        marker_size: float = 0.5,
        marker_noise: float = 0.2,
    ):
        self.cam = cam or CameraParams.create(
            500.0, 500.0, 320.0, 240.0, width=640, height=480, bl=0.1
        )
        self.n_frames = n_frames
        self.n_kpt_slots = n_kpt_slots
        self.noise_px = noise_px
        self.desc_bit_flips = desc_bit_flips
        self.depth_mode = depth_mode
        rng = np.random.default_rng(seed)
        self.rng = rng
        if trajectory == "orbit_out":
            # points on a surrounding cylinder shell (radius ~8): the camera
            # orbits inside looking outward, so features leave the view and
            # drift accumulates until the loop closes — the loop-closure
            # test geometry
            ang = rng.uniform(0, 2 * np.pi, n_points)
            r = rng.uniform(7, 9, n_points)
            self.points = np.stack(
                [r * np.sin(ang), rng.uniform(-2.5, 2.5, n_points), r * np.cos(ang)],
                -1,
            ).astype(np.float32)
        else:
            # blob slab at z in [4, 8] in world coords around origin
            self.points = np.stack(
                [
                    rng.uniform(-4, 4, n_points),
                    rng.uniform(-3, 3, n_points),
                    rng.uniform(4, 8, n_points),
                ],
                -1,
            ).astype(np.float32)
        self.descs = rng.integers(0, 2**32, (n_points, 8), dtype=np.uint32)
        self.brightness = rng.uniform(80, 255, n_points).astype(np.float32)
        # Physical size model: each blob has a max-detectable distance d0 (the
        # distance at which it is detected at pyramid octave 0). At distance
        # d it is detected at octave round(log(d0/d)/log(1.2)) — so
        # d * 1.2^octave ≈ d0 is distance-invariant, matching the
        # scale-invariance-bound behavior of a real ORB pyramid
        # (MapPoint min/max distances, reference mappoint.h:73-111).
        # Separate RNG stream so existing scene/marker draws are unchanged.
        rng_sz = np.random.default_rng(seed + 77003)
        self.point_d0 = rng_sz.uniform(10.0, 14.0, n_points).astype(np.float32)
        self.n_octaves = 8
        self.scale_factor = 1.2

        # markers: tilted squares scattered across the blob slab
        self.marker_size = marker_size
        self.marker_noise = marker_noise
        self._marker_detector = None
        if n_markers > 0:
            from ucoslam_tpu.geometry.se3 import se3_exp
            from ucoslam_tpu.markers.detector import SyntheticMarkerDetector
            import jax.numpy as _jnp

            marker_poses = {}
            for mid in range(n_markers):
                xi = np.concatenate(
                    [
                        [rng.uniform(-2.5, 2.5), rng.uniform(-2, 2), rng.uniform(4.5, 6.5)],
                        rng.uniform(-0.5, 0.5, 3),
                    ]
                ).astype(np.float32)
                marker_poses[100 + mid] = np.asarray(se3_exp(_jnp.asarray(xi)))
            self._marker_detector = SyntheticMarkerDetector(marker_poses, marker_size)

        # trajectory
        self.poses = []  # list of (4,4) pose_f2g (world -> camera)
        center = np.array([0.0, 0.0, 6.0])
        for i in range(n_frames):
            s = i / max(n_frames - 1, 1) * motion_scale
            if trajectory == "arc":
                ang = (s - 0.5) * 0.8
                eye = np.array([3.0 * np.sin(ang), 0.6 * np.sin(2 * ang), -0.5 + 0.3 * s])
            elif trajectory == "line":
                eye = np.array([-1.5 + 3.0 * s, 0.0, -0.5])
            elif trajectory == "loop":
                ang = 2 * np.pi * s
                eye = np.array([1.5 * np.sin(ang), 0.0, -0.5 + 1.0 * np.sin(ang / 2) ** 2])
            elif trajectory == "orbit_out":
                ang = 2 * np.pi * s
                eye = np.array([2.0 * np.sin(ang), 0.0, 2.0 * np.cos(ang)])
                center = eye + np.array([4.0 * np.sin(ang), 0.0, 4.0 * np.cos(ang)])
            else:
                raise ValueError(trajectory)
            R, t = _lookat(eye, center)
            self.poses.append(np.vstack([np.hstack([R, t[:, None]]), [0, 0, 0, 1]]).astype(np.float32))

    # -- ground truth ----------------------------------------------------
    def gt_pose(self, i: int) -> np.ndarray:
        return self.poses[i]

    def gt_positions(self) -> np.ndarray:
        """(F, 3) camera centers in world coords."""
        out = []
        for T in self.poses:
            R, t = T[:3, :3], T[:3, 3]
            out.append(-R.T @ t)
        return np.stack(out)

    # -- frame generation ------------------------------------------------
    def frame(self, i: int) -> Frame:
        """Oracle-mode Frame for index i (deterministic per (seed, i))."""
        rng = np.random.default_rng((id(self) & 0) + 7919 * i + 13)
        T = self.poses[i]
        R, t = T[:3, :3], T[:3, 3]
        cam_pts = self.points @ R.T + t
        z = cam_pts[:, 2]
        uv = np.asarray(self.cam.project(jnp.asarray(cam_pts)))
        vis = (
            (z > 0.5)
            & (uv[:, 0] >= 5)
            & (uv[:, 0] < self.cam.width - 5)
            & (uv[:, 1] >= 5)
            & (uv[:, 1] < self.cam.height - 5)
        )
        idx = np.nonzero(vis)[0]
        rng.shuffle(idx)
        idx = np.sort(idx[: self.n_kpt_slots])
        n = len(idx)
        f = empty_frame(self.n_kpt_slots)
        uv_obs = uv[idx] + rng.normal(0, self.noise_px, (n, 2))
        desc = self.descs[idx].copy()
        for k in range(self.desc_bit_flips):
            w = rng.integers(0, 8, n)
            b = rng.integers(0, 32, n).astype(np.uint32)
            desc[np.arange(n), w] ^= (np.uint32(1) << b)
        depth = np.zeros(self.n_kpt_slots, np.float32)
        if self.depth_mode in ("stereo", "rgbd"):
            depth[:n] = z[idx] * (1.0 + rng.normal(0, 0.002, n))
        # detection octave from the physical size model (see __init__)
        dist = np.linalg.norm(cam_pts[idx], axis=-1).clip(1e-6)
        octave = np.clip(
            np.round(np.log(self.point_d0[idx] / dist) / np.log(self.scale_factor)),
            0,
            self.n_octaves - 1,
        ).astype(np.int32)
        oct_full = np.zeros(self.n_kpt_slots, np.int32)
        oct_full[:n] = octave
        pad2 = np.zeros((self.n_kpt_slots - n, 2), np.float32)
        f = f._replace(
            fseq=jnp.int32(i),
            xy=jnp.asarray(np.vstack([uv_obs, pad2]).astype(np.float32)),
            und_xy=jnp.asarray(np.vstack([uv_obs, pad2]).astype(np.float32)),
            desc=jnp.asarray(
                np.vstack([desc, np.zeros((self.n_kpt_slots - n, 8), np.uint32)])
            ),
            valid=jnp.asarray(np.arange(self.n_kpt_slots) < n),
            depth=jnp.asarray(depth),
            octave=jnp.asarray(oct_full),
        )
        if self._marker_detector is not None:
            f = f._replace(
                markers=self._marker_detector.detect_at_pose(
                    T, self.cam, noise=self.marker_noise, rng=rng
                )
            )
        # stash the true point index of each slot for debugging/tests
        self.last_true_ids = np.concatenate([idx, np.full(self.n_kpt_slots - n, -1)])
        return f

    def frames(self) -> Iterator[Frame]:
        for i in range(self.n_frames):
            yield self.frame(i)

    def render_stereo(self, i: int):
        """(left, right) rectified pair: right camera offset by baseline
        along +x of the left camera."""
        left = self.render(i)
        T = self.poses[i].copy()
        # right camera: x_r = x_l - bl (point coords shift by -bl in x)
        T_r = T.copy()
        T_r[0, 3] -= self.cam.bl
        saved = self.poses[i]
        self.poses[i] = T_r
        right = self.render(i)
        self.poses[i] = saved
        return left, right

    def render(self, i: int) -> np.ndarray:
        """(H, W) float32 image: sharp textured quads (corner-rich imagery).

        Each scene blob becomes an axis-aligned rectangle whose on-screen
        size scales with inverse depth; sharp edges give FAST corners and
        the distinct brightness pattern of neighbouring quads makes BRIEF
        descriptors discriminative.
        """
        T = self.poses[i]
        R, t = T[:3, :3], T[:3, 3]
        cam_pts = self.points @ R.T + t
        z = cam_pts[:, 2]
        uv = np.asarray(self.cam.project(jnp.asarray(cam_pts)))
        h, w = self.cam.height, self.cam.width
        img = np.full((h, w), 40.0, np.float32)
        vis = (z > 0.5) & (uv[:, 0] >= 3) & (uv[:, 0] < w - 3) & (uv[:, 1] >= 3) & (uv[:, 1] < h - 3)
        # stable per-blob aspect/scale so the same blob looks alike in
        # every frame (drawn back-to-front so occlusion is consistent)
        rngq = np.random.default_rng(12345)
        base = rngq.uniform(0.12, 0.35, (len(self.points), 2))
        order = np.argsort(-z)
        for j in order:
            if not vis[j]:
                continue
            x, y = uv[j]
            sx = base[j, 0] * self.cam.fx / z[j]
            sy = base[j, 1] * self.cam.fy / z[j]
            x0, x1 = int(max(0, x - sx)), int(min(w, x + sx + 1))
            y0, y1 = int(max(0, y - sy)), int(min(h, y + sy + 1))
            if x1 <= x0 or y1 <= y0:
                continue
            img[y0:y1, x0:x1] = self.brightness[j]
        return img
