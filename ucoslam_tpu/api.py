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
        self._system.wait_for_finished()
        meta = {
            "pose": None if self._system.pose is None else self._system.pose.tolist(),
            "kf_counter": self._system.manager.kf_counter,
            "last_kf_inliers": self._system.last_kf_inliers,
        }
        save_map(self._map, path, extra_meta=meta)

    def readFromFile(self, path: str, cam: CameraParams) -> None:
        from ucoslam_tpu.io.serialize import load_map_meta

        self._map = load_map(path)
        self._params = self._map.params
        self._system = System(self._params, cam, self._map)
        self._extractor = FrameExtractor(self._params, cam)
        meta = load_map_meta(path).get("extra", {})
        if meta.get("pose") is not None:
            self._system.pose = np.asarray(meta["pose"], np.float32)
            from ucoslam_tpu.config import TrackingState

            self._system.state = TrackingState.TRACKING
        self._system.manager.kf_counter = meta.get("kf_counter", self._map.n_keyframes)
        self._system.last_kf_inliers = meta.get("last_kf_inliers", 0)

    # -- introspection --------------------------------------------------
    @property
    def map(self) -> Map:
        return self._map

    def getSignatureStr(self) -> str:
        """Determinism hash (ucoslam.h:94 getSignatureStr)."""
        return f"{self._system.global_signature():016x}"

    def getCurrentPose_f2g(self) -> np.ndarray | None:
        return self._system.pose
