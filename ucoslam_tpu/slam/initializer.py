"""Map bootstrapping from two views, depth, or markers.

Counterpart of the reference MapInitializer (mapinitializer.cpp, obfuscated;
behavior per SURVEY.md §2/§3): keypoint path = match reference<->current
frame, parallel H/F hypotheses, motion recovery, triangulation, scale from
median depth; depth path (stereo/RGB-D) = instant single-frame map from
per-keypoint depth; marker path (ARUCO_initialize :2137) = pose from IPPE
pairs with the aruco_minerrratio_valid ambiguity gate.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.geometry.twoview import estimate_two_view, reconstruct_two_view
from ucoslam_tpu.mapping.frame import Frame
from ucoslam_tpu.mapping.map import FLAG_STEREO, Map
from ucoslam_tpu.matching.matcher import match_frames


def _min_max_dist(dist: np.ndarray, octave: np.ndarray, params: Params):
    """MapPoint scale-invariance bounds from creation distance + octave."""
    sf = params.scaleFactor
    max_d = dist * (sf ** octave)
    min_d = max_d / (sf ** (params.nOctaveLevels - 1))
    return min_d, max_d


def _view_normals(pts_w: np.ndarray, pose_f2g: np.ndarray) -> np.ndarray:
    R, t = pose_f2g[:3, :3], pose_f2g[:3, 3]
    center = -R.T @ t
    rays = pts_w - center
    return (rays / np.linalg.norm(rays, axis=1, keepdims=True).clip(1e-9)).astype(
        np.float32
    )


class MapInitializer:
    """Two-view / depth-based bootstrap writing directly into a Map."""

    def __init__(self, params: Params, cam: CameraParams):
        self.params = params
        self.cam = cam
        self.ref_frame: Frame | None = None
        self._key = jax.random.PRNGKey(params.signature() & 0x7FFFFFFF)

    def set_reference_frame(self, frame: Frame) -> None:
        self.ref_frame = frame

    # -- depth path (stereo / RGB-D): one frame is enough ---------------
    def initialize_from_depth(self, frame: Frame, world_map: Map) -> bool:
        depth = np.asarray(frame.depth)
        valid = np.asarray(frame.valid) & (depth > 0)
        n = int(valid.sum())
        if n < 100:
            return False
        cam_pts = np.asarray(
            self.cam.unproject(frame.und_xy, frame.depth)
        )  # camera == world for first kf (pose = I)
        idx = np.nonzero(valid)[0]
        octave = np.asarray(frame.octave)[idx]
        dist = np.linalg.norm(cam_pts[idx], axis=1)
        min_d, max_d = _min_max_dist(dist, octave, self.params)
        ids = np.full(frame.n, -1, np.int32)
        slots = world_map.add_points(
            pos=cam_pts[idx],
            normal=_view_normals(cam_pts[idx], np.eye(4, dtype=np.float32)),
            desc=np.asarray(frame.desc)[idx],
            min_dist=min_d,
            max_dist=max_d,
            flags=np.full(len(idx), FLAG_STEREO, np.int32),
            creation_kf=0,
        )
        ids[idx] = slots
        frame = frame._replace(
            ids=jnp.asarray(ids), pose_f2g=jnp.eye(4, dtype=jnp.float32)
        )
        world_map.add_keyframe(frame)
        return True

    # -- keypoint two-view path -----------------------------------------
    def initialize_two_view(self, frame: Frame, world_map: Map):
        """Attempt 2-view init vs the stored reference frame.

        Returns (status, cur_frame_with_pose); status is "ok" on success
        ("no_ref" / "few_matches" / "no_geometry" otherwise — the caller
        re-seeds the reference only on few_matches, so low-parallax adjacent
        pairs keep waiting for baseline instead of resetting forever). On
        success the map holds 2 keyframes + triangulated points and the
        world scale is normalized to median scene depth 1 (the reference's
        median-depth normalization).
        """
        if self.ref_frame is None:
            return "no_ref", frame
        ref = self.ref_frame
        matches = match_frames(
            ref, frame, jnp.float32(self.params.maxDescDistance), nn_ratio=0.9
        )
        n_matches = int(matches.n_matches)
        if n_matches < 100:
            return "few_matches", frame
        self._key, sub = jax.random.split(self._key)
        t_idx = matches.train_idx
        uv1 = ref.und_xy
        uv2 = frame.und_xy[jnp.where(t_idx >= 0, t_idx, 0)]
        sigma2 = jnp.exp(
            2.0 * ref.octave.astype(jnp.float32) * jnp.log(jnp.float32(self.params.scaleFactor))
        )
        model = estimate_two_view(uv1, uv2, matches.valid, sigma2, sub)
        rec = reconstruct_two_view(
            model, uv1, uv2, matches.valid, sigma2, self.cam, self.cam,
            min_triangulated=jnp.int32(50), min_parallax_deg=jnp.float32(1.0),
        )
        if not bool(rec.ok):
            return "no_geometry", frame

        pts = np.asarray(rec.points)
        ok = np.asarray(rec.point_ok)
        # normalize scale: median depth (in ref camera = world) -> 1
        med = float(np.median(pts[ok][:, 2]))
        if med <= 1e-6:
            return "no_geometry", frame
        scale = 1.0 / med
        pts = pts * scale
        pose2 = np.asarray(rec.pose_21).copy()
        pose2[:3, 3] *= scale

        idx1 = np.nonzero(ok)[0]  # keypoint index in ref frame
        idx2 = np.asarray(matches.train_idx)[idx1]
        octave1 = np.asarray(ref.octave)[idx1]
        dist = np.linalg.norm(pts[idx1], axis=1)
        min_d, max_d = _min_max_dist(dist, octave1, self.params)
        slots = world_map.add_points(
            pos=pts[idx1],
            normal=_view_normals(pts[idx1], np.eye(4, dtype=np.float32)),
            desc=np.asarray(ref.desc)[idx1],
            min_dist=min_d,
            max_dist=max_d,
            flags=np.zeros(len(idx1), np.int32),
            creation_kf=0,
        )
        ids1 = np.full(ref.n, -1, np.int32)
        ids1[idx1] = slots
        ids2 = np.full(frame.n, -1, np.int32)
        ids2[idx2] = slots
        ref2 = ref._replace(ids=jnp.asarray(ids1), pose_f2g=jnp.eye(4, dtype=jnp.float32))
        cur = frame._replace(ids=jnp.asarray(ids2), pose_f2g=jnp.asarray(pose2))
        world_map.add_keyframe(ref2)
        world_map.add_keyframe(cur)
        return "ok", cur
