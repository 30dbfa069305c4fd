"""Top-level SLAM orchestration and tracking state machine.

Counterpart of the reference System (system.{h,cpp}, obfuscated; behavior per
SURVEY.md §2/§3.2): per frame — extract (done by caller or FrameExtractor),
initialize if map empty, else track with motion-model prior; relocalize when
lost; keyframe decision -> MapManager; MODE_SLAM vs MODE_LOCALIZATION.
Sequential deterministic mode only (the reference's runSequential); the
mapping step runs inline between frames.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.config import Mode, Params, TrackingState
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.mapping.frame import Frame
from ucoslam_tpu.mapping.map import Map
from ucoslam_tpu.slam.initializer import MapInitializer
from ucoslam_tpu.slam.mapmanager import MapManager
from ucoslam_tpu.slam.tracker import Tracker


class System:
    def __init__(self, params: Params, cam: CameraParams, world_map: Map | None = None):
        self.params = params
        self.cam = cam
        self.map = world_map or Map(params)
        self.tracker = Tracker(params, cam)
        self.initializer = MapInitializer(params, cam)
        self.manager = MapManager(params, cam)
        self.mode = Mode.SLAM
        self.state = TrackingState.LOST
        self.pose = None  # last pose_f2g (np 4x4) or None
        self.prev_pose = None
        self.velocity = np.eye(4, dtype=np.float32)  # motion model increment
        self.frames_since_kf = 0
        self.last_kf_inliers = 0
        self.stats_log = []

    # -- helpers --------------------------------------------------------
    def _prior(self) -> jnp.ndarray:
        if self.pose is None:
            return jnp.eye(4)
        return jnp.asarray(self.velocity @ self.pose)

    def _update_motion_model(self, new_pose: np.ndarray):
        if self.pose is not None:
            self.velocity = (new_pose @ np.linalg.inv(self.pose)).astype(np.float32)
        self.prev_pose = self.pose
        self.pose = new_pose.astype(np.float32)

    # -- main entry -----------------------------------------------------
    def process_frame(self, frame: Frame) -> np.ndarray | None:
        """Process one extracted frame; returns pose_f2g or None if lost.

        (counterpart UcoSlam::process -> System::process, ucoslam.cpp:20-28)
        """
        if self.map.n_keyframes == 0:
            if self.mode == Mode.LOCALIZATION:
                return None
            return self._try_initialize(frame)

        if self.state == TrackingState.TRACKING:
            res = self.tracker.track(self.map, frame, self._prior())
        else:
            res = self.tracker.relocalize(self.map, frame)

        if not res.ok:
            self.state = TrackingState.LOST
            self._log(frame, None, 0)
            return None

        self.state = TrackingState.TRACKING
        pose = np.asarray(res.pose_f2g)
        self._update_motion_model(pose)
        self.frames_since_kf += 1

        if self.mode == Mode.SLAM and self._need_keyframe(res):
            self.manager.new_keyframe(self.map, res.frame)
            self.frames_since_kf = 0
            self.last_kf_inliers = res.n_inliers
        self._log(frame, pose, res.n_inliers)
        return pose

    def _try_initialize(self, frame: Frame) -> np.ndarray | None:
        depth_frame = bool(np.asarray(frame.depth > 0).any())
        if depth_frame:
            if self.initializer.initialize_from_depth(frame, self.map):
                self.state = TrackingState.TRACKING
                pose = np.eye(4, dtype=np.float32)
                self._update_motion_model(pose)
                self.manager.kf_counter = 1
                self.last_kf_inliers = int(np.asarray(frame.valid).sum())
                self._log(frame, pose, self.last_kf_inliers)
                return pose
            return None
        if self.initializer.ref_frame is None:
            self.initializer.set_reference_frame(frame)
            self._log(frame, None, 0)
            return None
        status, cur = self.initializer.initialize_two_view(frame, self.map)
        if status != "ok":
            # Re-seed only when the scene moved on (too few matches); a
            # geometric failure usually means insufficient baseline yet.
            if status == "few_matches":
                self.initializer.set_reference_frame(frame)
            self._log(frame, None, 0)
            return None
        self.state = TrackingState.TRACKING
        pose = np.asarray(cur.pose_f2g)
        self._update_motion_model(pose)
        self.manager.kf_counter = 2
        self.last_kf_inliers = int(np.asarray(cur.ids >= 0).sum())
        self._log(frame, pose, self.last_kf_inliers)
        return pose

    def _need_keyframe(self, res) -> bool:
        """Keyframe policy (reference: KFMinConfidence + thRefRatio +
        stereo close-point counts, system.cpp:1786 region)."""
        p = self.params
        if self.frames_since_kf < 1:
            return False
        if self.map.keyframes.n_active >= p.maxKeyFrames - 1:
            return False
        ref = max(self.last_kf_inliers, 1)
        weak = res.n_inliers < p.thRefRatio * ref
        starving = res.n_inliers < 0.5 * ref
        stale = self.frames_since_kf >= 20
        enough = res.n_inliers >= 20
        return enough and (weak or starving or stale)

    def _log(self, frame, pose, n_inliers):
        self.stats_log.append(
            {
                "fseq": int(frame.fseq),
                "tracked": pose is not None,
                "n_inliers": n_inliers,
                "n_points": self.map.n_points,
                "n_kf": self.map.n_keyframes,
            }
        )

    # -- public control (facade surface) --------------------------------
    def set_mode(self, mode: Mode) -> None:
        self.mode = mode

    def reset_tracker(self) -> None:
        """Re-enter a known map (ucoslam.h:61 resetTracker)."""
        self.state = TrackingState.LOST
        self.pose = None
        self.velocity = np.eye(4, dtype=np.float32)

    def global_signature(self) -> int:
        """Determinism signature over map + params
        (counterpart UcoSlam::getSignatureStr, ucoslam.h:94)."""
        return self.map.signature() ^ self.params.signature()
