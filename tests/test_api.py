"""Public facade tests: UcoSlam over images + save/load + global BA."""

import numpy as np
import pytest

from ucoslam_tpu.api import UcoSlam
from ucoslam_tpu.config import Mode, Params
from ucoslam_tpu.geometry import ate_rmse
from ucoslam_tpu.io import SyntheticSequence
from ucoslam_tpu.io.serialize import load_map, save_map

PARAMS = Params().replace(
    maxMapPoints=4096,
    maxKeyFrames=32,
    maxKeyPointsPerFrame=512,
    maxDescDistance=60.0,
    detectMarkers=False,
)


def run_oracle(slam, seq, n=None):
    poses = {}
    for i in range(n or seq.n_frames):
        p = slam.process_frame(seq.frame(i))
        if p is not None:
            poses[i] = p
    return poses


class TestFacade:
    def test_oracle_slam_and_signature(self):
        seq = SyntheticSequence(n_frames=30, seed=9)
        slam = UcoSlam()
        slam.setParams(None, PARAMS, seq.cam)
        poses = run_oracle(slam, seq)
        assert len(poses) > 25
        sig = slam.getSignatureStr()
        assert len(sig) == 16
        # second identical run -> identical signature
        slam2 = UcoSlam()
        slam2.setParams(None, PARAMS, seq.cam)
        run_oracle(slam2, SyntheticSequence(n_frames=30, seed=9))
        assert slam2.getSignatureStr() == sig

    def test_global_optimization_improves_chi2(self):
        seq = SyntheticSequence(n_frames=30, seed=9)
        slam = UcoSlam()
        slam.setParams(None, PARAMS, seq.cam)
        run_oracle(slam, seq)
        chi_before = slam.map.global_reproj_chi2(seq.cam)
        slam.globalOptimization(n_iters=20)
        chi_after = slam.map.global_reproj_chi2(seq.cam)
        assert chi_after <= chi_before * 1.05
        assert chi_after < 2.0

    def test_save_load_roundtrip(self, tmp_path):
        seq = SyntheticSequence(n_frames=20, seed=9)
        slam = UcoSlam()
        slam.setParams(None, PARAMS, seq.cam)
        run_oracle(slam, seq)
        path = str(tmp_path / "session.slm")
        slam.saveToFile(path)
        sig = slam.map.signature()

        m2 = load_map(path)
        assert m2.signature() == sig
        assert m2.n_points == slam.map.n_points
        assert m2.n_keyframes == slam.map.n_keyframes

        # resume: localization over the same sequence from the loaded map
        slam2 = UcoSlam()
        slam2.readFromFile(path, seq.cam)
        slam2.setMode(Mode.LOCALIZATION)
        poses = run_oracle(slam2, seq)
        assert len(poses) > 15

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "junk.slm"
        p.write_bytes(b"not a map")
        with pytest.raises(Exception):
            load_map(str(p))

    def test_image_pipeline_tracks(self):
        """Full image path: render -> ORB -> SLAM (small but real)."""
        seq = SyntheticSequence(
            n_frames=8, seed=11, n_points=500, n_kpt_slots=512, motion_scale=0.45
        )
        params = PARAMS.replace(maxKeyPointsPerFrame=512, nOctaveLevels=4)
        slam = UcoSlam()
        slam.setParams(None, params, seq.cam)
        tracked = 0
        for i in range(seq.n_frames):
            img = seq.render(i)
            pose = slam.process(img, fseq=i)
            tracked += pose is not None
        assert tracked >= 4, f"tracked {tracked} of 8 image frames"


class TestResumeSignatureParity:
    def test_resume_equals_straight_run(self):
        """Mid-sequence checkpoint/resume reproduces the straight run's
        per-frame signature stream (the reference harness's `-slam` resume,
        test_sequence.cpp:212-222; System serialization
        system.cpp:2837-3102). The signature covers tracker state — pose,
        motion model, counters, mode — not just the map."""
        import tempfile, os

        seq = SyntheticSequence(n_frames=24, seed=13)

        def sigs_from(slam, start):
            out = []
            for i in range(start, seq.n_frames):
                slam.process_frame(seq.frame(i))
                out.append(slam.getSignatureStr())
            return out

        # straight run, recording signatures after frame 11
        s1 = UcoSlam()
        s1.setParams(None, PARAMS, seq.cam)
        for i in range(12):
            s1.process_frame(seq.frame(i))
        with tempfile.TemporaryDirectory() as d:
            ckpt = os.path.join(d, "mid.slm")
            s1.saveToFile(ckpt)
            straight = sigs_from(s1, 12)

            s2 = UcoSlam()
            s2.readFromFile(ckpt, seq.cam)
            resumed = sigs_from(s2, 12)
        assert straight == resumed, (
            f"resume diverged at frame "
            f"{next(i for i, (a, b) in enumerate(zip(straight, resumed)) if a != b)}"
        )


class TestMarkerDetectorRestore:
    def test_read_from_file_restores_marker_detector(self, tmp_path):
        """VERDICT r4 item 1a: readFromFile must reconstruct the marker
        detector from Params exactly as setParams does (the reference
        restores the full FrameExtractor config — aruco included — from
        the stream, feature2dserializable.h:71). A reloaded marker-map
        checkpoint fed a marker image must still detect, and the
        metric_locked flag must survive (ADVICE r3 high)."""
        from ucoslam_tpu.markers.native import native_available

        if not native_available():
            pytest.skip("native aruco library not built")
        seq = SyntheticSequence(
            n_frames=12, seed=3, n_points=700, n_markers=4, marker_size=0.8
        )
        params = PARAMS.replace(
            detectMarkers=True, aruco_markerSize=0.8,
            forceInitializationFromMarkers=True,
            aruco_allowOneFrameInitialization=True,
        )
        slam = UcoSlam()
        slam.setParams(None, params, seq.cam)
        for i in range(seq.n_frames):
            img = np.clip(seq.render(i), 0, 255).astype(np.uint8)
            slam.process(img, fseq=i)
        assert slam._system.manager.metric_locked
        path = str(tmp_path / "marker_session.slm")
        slam.saveToFile(path)

        slam2 = UcoSlam()
        slam2.readFromFile(path, seq.cam)
        # the detector came back from Params
        assert slam2._extractor.marker_detector is not None
        assert slam2._extractor.marker_detector.available
        # metric-ness survived the checkpoint (no second rescale possible)
        assert slam2._system.manager.metric_locked
        # a marker image still produces marker observations end-to-end
        img = np.clip(seq.render(5), 0, 255).astype(np.uint8)
        f = slam2._extractor.process(img, fseq=100)
        assert bool(np.asarray(f.markers.valid).any()), (
            "reloaded session no longer detects markers"
        )


class TestUpdateParams:
    def test_update_params_reaches_captured_copies(self):
        """updateParams must propagate into every component's captured
        Params (the recovery protocol's KF tightening was a silent no-op
        when only the facade field changed)."""
        seq = SyntheticSequence(n_frames=2, seed=1)
        slam = UcoSlam()
        slam.setParams(None, PARAMS, seq.cam)
        tightened = slam._params.replace(KFMinConfidence=0.9, KFCulling=0.9)
        slam.updateParams(tightened)
        sysd = slam._system
        for comp in (
            sysd, sysd.tracker, sysd.initializer, sysd.manager,
            sysd.manager.loop_detector,
        ):
            assert comp.params.KFMinConfidence == pytest.approx(0.9), comp
            assert comp.params.KFCulling == pytest.approx(0.9), comp
