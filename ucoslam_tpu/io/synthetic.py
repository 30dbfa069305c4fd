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
        roll_deg: float = 0.0,  # sinusoidal camera roll over the sequence
        brightness_drift: float = 0.0,  # per-frame global gain amplitude
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
        self.roll_deg = roll_deg
        self.brightness_drift = brightness_drift
        # render-mode quad statics: world-anchored half-sizes, in-plane
        # rotations and 8x8 block textures (view-consistent by construction
        # — texture coordinates live on the quad's world plane)
        rngq = np.random.default_rng(12345)
        self.quad_half = rngq.uniform(0.12, 0.35, (n_points, 2)).astype(np.float32)
        self.quad_theta = rngq.uniform(-np.pi / 4, np.pi / 4, n_points).astype(
            np.float32
        )
        tex = rngq.uniform(0.45, 1.55, (n_points, 8, 8)).astype(np.float32)
        self.quad_tex = np.clip(
            tex * self.brightness[:, None, None], 25.0, 255.0
        ).astype(np.float32)
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

            # markers face the camera side (marker +z toward -z world): the
            # trajectory looks along +z, so without the flip the renderer
            # would show marker backs (mirrored bits, undetectable)
            flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
            marker_poses = {}
            for mid in range(n_markers):
                xi = np.concatenate(
                    [
                        [rng.uniform(-2.5, 2.5), rng.uniform(-2, 2), rng.uniform(4.5, 6.5)],
                        rng.uniform(-0.5, 0.5, 3),
                    ]
                ).astype(np.float32)
                marker_poses[100 + mid] = np.asarray(se3_exp(_jnp.asarray(xi))) @ flip
            # clear scene quads near markers so rendered markers are not
            # occluded (physical scenes don't have texture pasted on markers)
            centers = np.stack([T[:3, 3] for T in marker_poses.values()])
            r_excl = 0.5 * marker_size * 1.45 * np.sqrt(2.0) + 0.55
            d = np.linalg.norm(
                self.points[:, None, :] - centers[None, :, :], axis=-1
            ).min(1)
            keep = d > r_excl
            self.points = self.points[keep]
            self.descs = self.descs[keep]
            self.brightness = self.brightness[keep]
            self.quad_half = self.quad_half[keep]
            self.quad_theta = self.quad_theta[keep]
            self.quad_tex = self.quad_tex[keep]
            self.point_d0 = self.point_d0[keep]
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
            elif trajectory == "sweep_back":
                # gentle revisit: inward-looking sweep around the scene
                # that returns to its start — generous frame overlap
                # throughout (the central slab stays in view), so both
                # engines survive and a head-to-head on it compares
                # loop-seam map correction, not tracking collapse
                ang = np.deg2rad(60.0) * np.sin(np.pi * s)
                eye = center + np.array([
                    5.0 * np.sin(ang),
                    0.4 * np.sin(2 * np.pi * s),
                    -5.0 * np.cos(ang),
                ])
            else:
                raise ValueError(trajectory)
            R, t = _lookat(eye, center)
            if roll_deg != 0.0:
                # rotating-camera segment: sinusoidal roll about the optical
                # axis exercises in-plane descriptor rotation invariance
                phi = np.deg2rad(roll_deg) * np.sin(2 * np.pi * s)
                c, sn = np.cos(phi), np.sin(phi)
                Rz = np.array(
                    [[c, -sn, 0.0], [sn, c, 0.0], [0.0, 0.0, 1.0]], np.float32
                )
                R = Rz @ R
                t = Rz @ t
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
        return self._render(i)[0]

    def render_with_depth(self, i: int):
        """(image, depth) of frame i — depth is the per-pixel z of the
        visible surface (0 = background), the renderer's exact z-buffer.
        Used by metric stereo-depth accuracy gates."""
        return self._render(i, with_depth=True)

    def _render(self, i: int, with_depth: bool = False):
        """Homography-rasterized textured quads (adversarial imagery).

        Each scene blob is a world-anchored quad in the z=const plane,
        rotated in-plane by a per-quad angle and carrying an 8x8 block
        texture on its surface — texture and rotation are view-consistent,
        so descriptors must survive perspective, camera roll and scale
        change, unlike the earlier axis-aligned constant-brightness boxes.
        Depth output is the exact per-pixel camera-frame z.
        """
        T = self.poses[i]
        R, t = T[:3, :3], T[:3, 3]
        fx, fy = float(self.cam.fx), float(self.cam.fy)
        cx, cy = float(self.cam.cx), float(self.cam.cy)
        K = np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float32)
        h, w = self.cam.height, self.cam.width
        img = np.full((h, w), 40.0, np.float32)
        dep = np.zeros((h, w), np.float32) if with_depth else None

        cam_pts = self.points @ R.T + t
        z = cam_pts[:, 2]
        # world in-plane quad basis (rotated by theta in the z=const plane)
        cth, sth = np.cos(self.quad_theta), np.sin(self.quad_theta)
        U = np.stack([cth, sth, np.zeros_like(cth)], -1) * self.quad_half[:, :1]
        V = np.stack([-sth, cth, np.zeros_like(cth)], -1) * self.quad_half[:, 1:2]
        # render items: (z_center, U_cam (3,), V_cam (3,), center_cam (3,), tex)
        items = [
            (z[j], R @ U[j], R @ V[j], cam_pts[j], self.quad_tex[j])
            for j in range(len(self.points))
        ]
        # real marker bitmaps drawn as world-anchored planes: the rendered
        # images contain actual detectable ARUCO_MIP_36h12 markers (the
        # reference's SPM marker-suite stand-in). Quad half-extent covers
        # the quiet zone; the black border spans the physical marker size.
        if self._marker_detector is not None and getattr(self, "render_markers", True):
            from ucoslam_tpu.markers.dictionary import marker_texture

            for mid, g2m in sorted(self._marker_detector.poses.items()):
                tex, ratio = marker_texture(mid % 250, px_per_cell=8)
                Tm = T @ g2m  # marker -> camera
                hext = 0.5 * self.marker_size * ratio
                items.append(
                    (
                        float(Tm[2, 3]),
                        Tm[:3, 0] * hext,
                        Tm[:3, 1] * hext,
                        Tm[:3, 3],
                        np.flipud(tex).copy(),  # row 0 of tex = marker top = +y
                    )
                )
        items.sort(key=lambda it: -it[0])  # painter's algorithm, far to near
        for zj, Uc, Vc, Cc, tex in items:
            if zj < 0.5:
                continue
            # homography (s, t, 1) -> pixel for this plane item
            cols = np.stack([Uc, Vc, Cc], 1)  # (3, 3)
            H = K @ cols
            # projected corners -> integer bounding box
            corn = H @ np.array(
                [[-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1]], np.float32
            ).T  # (3, 4)
            if (corn[2] < 1e-3).any():
                continue  # quad crosses the image plane; skip
            cu = corn[0] / corn[2]
            cv = corn[1] / corn[2]
            x0 = max(0, int(np.floor(cu.min())))
            x1 = min(w, int(np.ceil(cu.max())) + 1)
            y0 = max(0, int(np.floor(cv.min())))
            y1 = min(h, int(np.ceil(cv.max())) + 1)
            if x1 <= x0 or y1 <= y0:
                continue
            try:
                Hinv = np.linalg.inv(H)
            except np.linalg.LinAlgError:
                continue
            ys, xs = np.mgrid[y0:y1, x0:x1]
            q = np.einsum(
                "ab,byx->ayx",
                Hinv,
                np.stack([xs.astype(np.float32), ys.astype(np.float32),
                          np.ones_like(xs, np.float32)]),
            )
            s = q[0] / q[2]
            tt = q[1] / q[2]
            inside = (np.abs(s) <= 1.0) & (np.abs(tt) <= 1.0) & (q[2] != 0)
            if not inside.any():
                continue
            th, tw = tex.shape
            ti = np.clip((((s + 1.0) * 0.5) * tw).astype(np.int32), 0, tw - 1)
            tj = np.clip((((tt + 1.0) * 0.5) * th).astype(np.int32), 0, th - 1)
            patch = img[y0:y1, x0:x1]
            patch[inside] = tex[tj[inside], ti[inside]]
            if with_depth:
                # exact camera-frame depth of the surface point (Uc/Vc are
                # camera-frame plane basis vectors, so z = Cc.z + s*Uc.z + t*Vc.z)
                zpix = Cc[2] + s * Uc[2] + tt * Vc[2]
                dpatch = dep[y0:y1, x0:x1]
                dpatch[inside] = zpix[inside]
        if self.brightness_drift != 0.0:
            sfrac = i / max(self.n_frames - 1, 1)
            gain = 1.0 + self.brightness_drift * np.sin(2 * np.pi * sfrac)
            img = np.clip(img * gain, 0.0, 255.0)
        return img, dep
