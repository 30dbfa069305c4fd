"""End-to-end SLAM on synthetic oracle sequences (the golden-sequence gate).

Counterpart of the reference's tests/test_sequence.cpp protocol, with
synthetic ground truth instead of TUM videos (SURVEY.md §4)."""

import numpy as np
import pytest

from ucoslam_tpu.config import Mode, Params
from ucoslam_tpu.geometry import ate_rmse
from ucoslam_tpu.io import SyntheticSequence
from ucoslam_tpu.slam import System

PARAMS = Params().replace(
    maxMapPoints=4096,
    maxKeyFrames=32,
    maxKeyPointsPerFrame=512,
    maxDescDistance=60.0,
    ransacIters=256,
)


def run_sequence(seq, params=PARAMS, mode=Mode.SLAM, system=None):
    sys_ = system or System(params, seq.cam)
    sys_.set_mode(mode)
    poses = {}
    for i in range(seq.n_frames):
        pose = sys_.process_frame(seq.frame(i))
        if pose is not None:
            poses[i] = pose
    return sys_, poses


def centers_of(poses: dict):
    idx = sorted(poses)
    c = []
    for i in idx:
        T = poses[i]
        c.append(-T[:3, :3].T @ T[:3, 3])
    return idx, np.stack(c)


class TestMonocular:
    def test_tracks_and_maps(self):
        seq = SyntheticSequence(n_frames=40, seed=1)
        sys_, poses = run_sequence(seq)
        # tracked almost all frames (first frame is the init reference)
        assert len(poses) >= 0.9 * (seq.n_frames - 2), f"tracked {len(poses)}"
        idx, est = centers_of(poses)
        gt = seq.gt_positions()[idx]
        ate = ate_rmse(est, gt, with_scale=True)  # mono: scale-aligned
        assert ate < 0.05, f"ATE {ate}"
        assert sys_.map.n_keyframes >= 2
        assert sys_.map.n_points > 200
        sys_.map.check_consistency()

    def test_deterministic_signature(self):
        seq1 = SyntheticSequence(n_frames=25, seed=3)
        seq2 = SyntheticSequence(n_frames=25, seed=3)
        sys1, poses1 = run_sequence(seq1)
        sys2, poses2 = run_sequence(seq2)
        assert sys1.global_signature() == sys2.global_signature()
        for i in poses1:
            np.testing.assert_array_equal(poses1[i], poses2[i])

    def test_localization_mode_after_mapping(self):
        seq = SyntheticSequence(n_frames=40, seed=1)
        sys_, _ = run_sequence(seq)
        n_pts = sys_.map.n_points
        n_kf = sys_.map.n_keyframes
        sys_.set_mode(Mode.LOCALIZATION)
        sys_.reset_tracker()
        _, poses2 = run_sequence(seq, system=sys_, mode=Mode.LOCALIZATION)
        # map must be untouched in localization mode
        assert sys_.map.n_points == n_pts and sys_.map.n_keyframes == n_kf
        assert len(poses2) >= 0.9 * seq.n_frames
        idx, est = centers_of(poses2)
        ate = ate_rmse(est, seq.gt_positions()[idx], with_scale=True)
        assert ate < 0.05


class TestRGBD:
    def test_tracks_with_true_scale(self):
        seq = SyntheticSequence(n_frames=30, seed=5, depth_mode="rgbd")
        sys_, poses = run_sequence(seq)
        assert len(poses) >= 0.9 * (seq.n_frames - 1)
        idx, est = centers_of(poses)
        gt = seq.gt_positions()[idx]
        # depth gives metric scale: align WITHOUT scale correction
        ate = ate_rmse(est, gt, with_scale=False)
        assert ate < 0.05, f"metric ATE {ate}"


class TestRecovery:
    def test_relocalizes_after_gap(self):
        seq = SyntheticSequence(n_frames=40, seed=7)
        sys_ = System(PARAMS, seq.cam)
        lost_frames = set(range(18, 24))
        tracked_after = 0
        for i in range(seq.n_frames):
            if i in lost_frames:
                sys_.reset_tracker()  # simulate tracking loss
                continue
            pose = sys_.process_frame(seq.frame(i))
            if i >= 24 and pose is not None:
                tracked_after += 1
        assert tracked_after >= 0.8 * (seq.n_frames - 24), f"only {tracked_after}"

    def test_reloc_uses_bow_candidates_not_brute_force(self, monkeypatch):
        """With a keyframe database present, relocalization goes through
        BoW candidate retrieval + per-candidate matching — whose cost is
        O(candidates x N_frame^2), independent of the map-point arena size
        (keyframedatabase.cpp:195-304 + system.cpp:4923-5292). The brute
        force over ALL map points must not run."""
        from ucoslam_tpu.slam import tracker as tracker_mod

        def _boom(*a, **k):
            raise AssertionError("brute-force reloc ran despite BoW database")

        monkeypatch.setattr(tracker_mod, "_reloc_match", _boom)
        seq = SyntheticSequence(n_frames=30, seed=7)
        sys_ = System(PARAMS, seq.cam)
        relocalized = 0
        for i in range(seq.n_frames):
            if i in (15, 16):
                sys_.reset_tracker()
                continue
            pose = sys_.process_frame(seq.frame(i))
            if i > 16 and pose is not None:
                relocalized += 1
        assert relocalized >= 0.8 * (seq.n_frames - 17), f"only {relocalized}"

    def test_reloc_brute_force_fallback_without_vocab(self):
        """DummyDataBase (no vocabulary): reloc falls back to brute-force
        matching against the whole arena (keyframedatabase.cpp:98)."""
        seq = SyntheticSequence(n_frames=30, seed=7)
        sys_ = System(PARAMS, seq.cam)
        sys_.manager.kfdb.dummy = True
        relocalized = 0
        for i in range(seq.n_frames):
            if i in (15, 16):
                sys_.reset_tracker()
                continue
            pose = sys_.process_frame(seq.frame(i))
            if i > 16 and pose is not None:
                relocalized += 1
        assert relocalized >= 0.8 * (seq.n_frames - 17), f"only {relocalized}"


class TestArenaGrowth:
    def test_long_run_grows_past_caps(self):
        """Tiny initial arenas must not starve a long sequence: the
        MapManager doubles the point/keyframe arenas when full (SURVEY §5
        map-size scaling; round-1 VERDICT missing #6) and tracking keeps
        bounded ATE throughout."""
        # cap of 4: the paced keyframe policy (running-max thRefRatio,
        # r4) inserts ~1 kf / 10-20 frames, so a tiny cap still forces
        # arena doubling on this 80-frame sweep
        params = PARAMS.replace(maxKeyFrames=4, maxMapPoints=1024)
        seq = SyntheticSequence(n_frames=80, seed=13, trajectory="line",
                                motion_scale=2.0)
        sys_, poses = run_sequence(seq, params=params)
        assert sys_.map.state.K > 4, "keyframe arena never grew"
        assert len(poses) >= 0.85 * (seq.n_frames - 2), f"tracked {len(poses)}"
        idx, est = centers_of(poses)
        ate = ate_rmse(est, seq.gt_positions()[idx], with_scale=True)
        assert ate < 0.08, f"growth-run ATE {ate}"
        sys_.map.check_consistency()


class TestAsyncMapping:
    """Non-sequential dispatch: mapping worker thread + tracker snapshots
    (the reference's default two-thread mode, mapmanager.h:740,1178)."""

    def test_async_tracks_whole_sequence(self):
        """Async accuracy is BOUNDED relative to sequential (VERDICT r3
        item 8): repeated async runs on identical inputs must stay within
        1.5x the sequential ATE (+ a small absolute floor for worker/
        tracker interleave noise). The former 2.7x spread was seed luck —
        the initializer PRNG was seeded from params.signature(), which
        includes runSequential — not genuine async degradation."""
        seq = SyntheticSequence(n_frames=40, seed=3)
        seq_sys, seq_poses = run_sequence(seq, params=PARAMS)
        idx, est = centers_of(seq_poses)
        ate_seq = float(
            ate_rmse(est, seq.gt_positions()[idx], with_scale=True)
        )
        params = PARAMS.replace(runSequential=False)
        # 1.5x + an absolute floor for interleave noise (observed async
        # spread 0.018-0.035 vs sequential ~0.019 on this host)
        bound = 1.5 * ate_seq + 0.01
        for trial in range(10):
            sys_, poses = run_sequence(seq, params=params)
            sys_.wait_for_finished()
            assert len(poses) >= 0.85 * (seq.n_frames - 2), (
                f"trial {trial}: tracked {len(poses)}"
            )
            idx, est = centers_of(poses)
            ate = float(ate_rmse(est, seq.gt_positions()[idx], with_scale=True))
            assert ate < bound, (
                f"trial {trial}: async ATE {ate:.4f} vs sequential "
                f"{ate_seq:.4f} (bound {bound:.4f})"
            )
            assert sys_.map.n_keyframes >= 3
            sys_.shutdown()

    def test_async_worker_errors_surface(self):
        params = PARAMS.replace(runSequential=False)
        seq = SyntheticSequence(n_frames=6, seed=4)
        sys_, _ = run_sequence(seq, params=params)
        sys_.manager._worker_error = RuntimeError("boom")
        import pytest as _pytest

        with _pytest.raises(RuntimeError, match="boom"):
            sys_.wait_for_finished()
        sys_.shutdown()

    def test_wait_for_finished_drains_queue(self):
        params = PARAMS.replace(runSequential=False)
        seq = SyntheticSequence(n_frames=30, seed=5)
        sys_, poses = run_sequence(seq, params=params)
        sys_.wait_for_finished()
        assert not sys_.manager.busy()
        # map grew beyond the two init keyframes -> worker really ran
        assert sys_.map.n_keyframes >= 3
        assert sys_.map.n_points > 100
        sys_.shutdown()


class TestRenderModeE2E:
    """Full image path through the REAL ORB frontend (render -> FAST ->
    patch-matmul descriptors -> SLAM), with an accuracy gate — the closest
    in-repo equivalent of the reference's video benchmark protocol."""

    def test_render_sequence_ate(self):
        """Adversarial imagery: rotated textured quads + camera roll +
        brightness drift, 24 frames — tracked >= 75%, ATE < 0.08 (round-1
        gate was 16 easy frames / 60% / 0.15)."""
        from ucoslam_tpu.api import UcoSlam

        seq = SyntheticSequence(
            n_frames=24, seed=13, n_points=700, n_kpt_slots=512,
            motion_scale=0.6, roll_deg=12.0, brightness_drift=0.15,
        )
        params = PARAMS.replace(
            maxKeyPointsPerFrame=512, nOctaveLevels=4, detectMarkers=False,
        )
        slam = UcoSlam()
        slam.setParams(None, params, seq.cam)
        poses = {}
        for i in range(seq.n_frames):
            pose = slam.process(seq.render(i), fseq=i)
            if pose is not None:
                poses[i] = pose
        assert len(poses) >= 0.75 * seq.n_frames, f"tracked {len(poses)}"
        idx, est = centers_of(poses)
        ate = ate_rmse(est, seq.gt_positions()[idx], with_scale=True)
        assert ate < 0.08, f"render-mode ATE {ate}"
