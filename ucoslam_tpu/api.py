"""Public facade: the UcoSlam-equivalent user-facing class.

Counterpart of the reference `UcoSlam` pimpl facade (ucoslam.h:28-108,
ucoslam.cpp:11-71): setParams(map, params, vocabulary), process /
processStereo / processRGBD returning a 4x4 pose f2g (None = lost),
save/load of the full system state, globalOptimization, signature string.
"""

from __future__ import annotations

import numpy as np

from ucoslam_tpu.config import Mode, Params
from ucoslam_tpu.features.frame_extractor import FrameExtractor
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.io.serialize import load_map, save_map
from ucoslam_tpu.mapping.map import Map
from ucoslam_tpu.slam.system import System


def build_marker_detector_from_params(params: Params):
    """Construct the aruco detector the way the reference's
    System::setParams does from Params.aruco_* (frameextractor.cpp preserved
    names getDetectionModeFromString / setCornerRefinementMethod;
    ucoslamtypes.h:120-144). Returns None when detection is off or no
    backend is available; shared by setParams AND readFromFile (the
    reference restores the full FrameExtractor configuration — aruco
    included — from the serialized stream, feature2dserializable.h:71)."""
    if not params.detectMarkers:
        return None
    from ucoslam_tpu.markers.detector import ArucoDetector

    det = ArucoDetector(
        dictionary=params.aruco_Dictionary,
        marker_size=params.aruco_markerSize,
        corner_refine=params.aruco_CornerRefimentMethod,
        detection_mode=params.aruco_DetectionMode,
        min_marker_size=params.aruco_minMarkerSize,
    )
    return det if det.available else None


class UcoSlam:
    def __init__(self):
        self._system: System | None = None
        self._extractor: FrameExtractor | None = None
        self._params = Params()
        self._map: Map | None = None
        self._vocab_path: str | None = None

    # -- lifecycle (ucoslam.cpp:11 setParams) ---------------------------
    def setParams(
        self,
        world_map: Map | None,
        params: Params,
        cam: CameraParams,
        vocabulary: str | None = None,
        marker_detector=None,
    ) -> None:
        self._params = params
        self._map = world_map or Map(params)
        self._system = System(params, cam, self._map)
        if marker_detector is None:
            marker_detector = build_marker_detector_from_params(params)
        self._extractor = FrameExtractor(params, cam, marker_detector)
        self._vocab_path = vocabulary
        if vocabulary:
            # .fbow vocabulary (ucoslam.cpp:11; empty path keeps the
            # generated vocab — the reference's DummyDataBase path keeps
            # running without one)
            self._system.manager.kfdb.load_vocabulary(vocabulary)

    def clear(self) -> None:
        if self._system is not None:
            self._system.shutdown()
        self._system = None
        self._map = None

    # -- per-frame processing (ucoslam.cpp:20-28) -----------------------
    def prefetch(self, img: np.ndarray) -> None:
        """Hint: `img` will be the next process() argument — start its
        host->device upload now so it overlaps this frame's host work."""
        if self._extractor is not None:
            self._extractor.prefetch(img)

    def process(self, img: np.ndarray, fseq: int = 0) -> np.ndarray | None:
        """Monocular frame -> pose_f2g (4x4) or None when lost."""
        f = self._extractor.process(img, fseq)
        return self._system.process_frame(f)

    def processStereo(self, left: np.ndarray, right: np.ndarray, fseq: int = 0):
        f = self._extractor.process_stereo(left, right, fseq)
        return self._system.process_frame(f)

    def processRGBD(self, img: np.ndarray, depth: np.ndarray, fseq: int = 0):
        f = self._extractor.process_rgbd(img, depth, fseq)
        return self._system.process_frame(f)

    def process_frame(self, frame) -> np.ndarray | None:
        """Advanced: feed a pre-extracted Frame (oracle/testing path)."""
        return self._system.process_frame(frame)

    # -- modes / control ------------------------------------------------
    def setMode(self, mode: Mode) -> None:
        self._system.set_mode(mode)

    def updateParams(self, params: Params) -> None:
        """Change Params on a LIVE system (the reference mutates its shared
        Params reference mid-run, e.g. the recovery protocol's KF
        tightening, tests/test_sequence.cpp:268-296). Reaches every
        component's captured copy — assigning to ._params alone does not."""
        self._params = params
        if self._system is not None:
            self._system.set_params(params)

    def resetTracker(self) -> None:
        self._system.reset_tracker()

    def waitForFinished(self) -> None:
        """Drain the mapping worker (async mode); inline mode has nothing
        pending (ucoslam.h waitForFinished)."""
        self._system.wait_for_finished()

    def globalOptimization(self, n_iters: int | None = None) -> None:
        """Full bundle adjustment over the map (ucoslam.cpp:47)."""
        from ucoslam_tpu.optim.ba import global_bundle_adjustment

        self._system.wait_for_finished()

        global_bundle_adjustment(
            self._map, self._system.cam,
            n_iters=n_iters or self._params.baIters,
        )

    # -- persistence (ucoslam.cpp:41, map.cpp:339) ----------------------
    def saveToFile(self, path: str) -> None:
        """Full session checkpoint: map + motion model + counters + BoW
        keyframe database + extractor sensitivity (the reference
        serializes all of System/MapManager/KFDataBase/FrameExtractor,
        system.cpp:2865-3102, mapmanager.cpp:11425-12120)."""
        self._system.wait_for_finished()
        sysd = self._system
        meta = {
            "pose": None if sysd.pose is None else sysd.pose.tolist(),
            "prev_pose": None if sysd.prev_pose is None else sysd.prev_pose.tolist(),
            "velocity": sysd.velocity.tolist(),
            "state": int(sysd.state),
            "mode": int(sysd.mode),
            "frames_since_kf": sysd.frames_since_kf,
            "kf_counter": sysd.manager.kf_counter,
            "last_kf_inliers": sysd.last_kf_inliers,
            "metric_locked": sysd.manager.metric_locked,
            # rotation-rate KF-policy anchor + init-failure counter: part
            # of the tracker state the reference serializes wholesale
            # (system.cpp:2865-3102); without them a resumed session makes
            # different keyframe/init decisions than the straight run
            "last_kf_rot": None if sysd._last_kf_rot is None
            else sysd._last_kf_rot.tolist(),
            "init_failures": getattr(sysd, "_init_failures", 0),
            "kfdb_dummy": sysd.manager.kfdb.dummy,
            "fast_threshold": getattr(
                self._extractor.orb, "fast_threshold", None
            ) if self._extractor is not None else None,
        }
        kfdb = sysd.manager.kfdb
        # sparse postings (word ids + weights), NOT a dense (K, V) table —
        # checkpoints stay O(K * words_per_frame) at any vocabulary size
        arrays = {
            "kfdb_word_ids": np.asarray(kfdb.word_ids),
            "kfdb_word_w": np.asarray(kfdb.word_w),
            "kfdb_vocab": np.asarray(kfdb.vocab),
        }
        if kfdb.weights is not None:
            arrays["kfdb_weights"] = np.asarray(kfdb.weights)
        save_map(self._map, path, extra_meta=meta, extra_arrays=arrays)

    def readFromFile(self, path: str, cam: CameraParams) -> None:
        from ucoslam_tpu.config import Mode, TrackingState
        from ucoslam_tpu.io.serialize import load_map_extra_arrays, load_map_meta

        import jax.numpy as jnp

        self._map = load_map(path)
        self._params = self._map.params
        arrays = load_map_extra_arrays(path)
        meta = load_map_meta(path).get("extra", {})
        if "kfdb_word_ids" in arrays:
            # restore the serialized BoW database instead of re-deriving it
            # from the keyframes (load cost stays O(size of table))
            from ucoslam_tpu.mapping.kfdatabase import KeyFrameDataBase

            kfdb = KeyFrameDataBase(
                arrays["kfdb_word_ids"].shape[0],
                vocab=jnp.asarray(arrays["kfdb_vocab"]),
                weights=(
                    jnp.asarray(arrays["kfdb_weights"])
                    if "kfdb_weights" in arrays
                    else None
                ),
                dummy=bool(meta.get("kfdb_dummy", False)),
            )
            kfdb.word_ids = jnp.asarray(arrays["kfdb_word_ids"])
            kfdb.word_w = jnp.asarray(arrays["kfdb_word_w"])
        elif "kfdb_vocab" in arrays:
            # legacy checkpoint (dense kfdb_vectors): no sparse postings,
            # but the serialized vocabulary must still win over the default
            # built-in one, or reloc/loop scoring changes after loading
            from ucoslam_tpu.mapping.kfdatabase import KeyFrameDataBase

            kfdb = KeyFrameDataBase(
                max(self._map.keyframes.capacity, 1),
                vocab=jnp.asarray(arrays["kfdb_vocab"]),
                weights=(
                    jnp.asarray(arrays["kfdb_weights"])
                    if "kfdb_weights" in arrays
                    else None
                ),
                dummy=bool(meta.get("kfdb_dummy", False)),
            )
            for s in self._map.keyframes.active_slots():
                kfdb.add(
                    int(s), self._map.state.kf_desc[int(s)],
                    self._map.state.kf_kpt_valid[int(s)],
                )
        else:
            # no serialized database at all: System re-derives the
            # postings from the loaded keyframes with the default vocab
            kfdb = None
        self._system = System(self._params, cam, self._map, kfdb=kfdb)
        # restore the full extractor configuration, marker detector included
        # (the reference restores FrameExtractor — aruco config and all —
        # from the stream, feature2dserializable.h:71, system.cpp:2865-3102;
        # without this a reloaded marker map silently stops detecting)
        self._extractor = FrameExtractor(
            self._params, cam, build_marker_detector_from_params(self._params)
        )
        if "metric_locked" in meta:
            self._system.manager.metric_locked = bool(meta["metric_locked"])
        else:
            # legacy checkpoint: derive — lock when the map is known metric
            # (a valid marker pose or stereo/RGB-D depth observed)
            st = self._map.state
            self._system.manager.metric_locked = bool(
                np.asarray(st.mk_pose_valid).any()
                or np.asarray(st.kf_depth > 0).any()
            )
        if meta.get("fast_threshold") is not None and hasattr(
            self._extractor.orb, "fast_threshold"
        ):
            self._extractor.orb.fast_threshold = float(meta["fast_threshold"])
        if meta.get("pose") is not None:
            self._system.pose = np.asarray(meta["pose"], np.float32)
            self._system.state = TrackingState(meta.get("state", 0))
        if meta.get("prev_pose") is not None:
            self._system.prev_pose = np.asarray(meta["prev_pose"], np.float32)
        if meta.get("velocity") is not None:
            self._system.velocity = np.asarray(meta["velocity"], np.float32)
        self._system.frames_since_kf = meta.get("frames_since_kf", 0)
        self._system.mode = Mode(meta.get("mode", 0))
        self._system.manager.kf_counter = meta.get("kf_counter", self._map.n_keyframes)
        self._system.last_kf_inliers = meta.get("last_kf_inliers", 0)
        if meta.get("last_kf_rot") is not None:
            self._system._last_kf_rot = np.asarray(
                meta["last_kf_rot"], np.float32
            )
        self._system._init_failures = meta.get("init_failures", 0)

    # -- introspection --------------------------------------------------
    @property
    def map(self) -> Map:
        return self._map

    def getSignatureStr(self) -> str:
        """Determinism hash (ucoslam.h:94 getSignatureStr)."""
        return f"{self._system.global_signature():016x}"

    def getCurrentPose_f2g(self) -> np.ndarray | None:
        return self._system.pose
