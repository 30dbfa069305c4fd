"""Marker-aided SLAM: initialization with real scale, marker relocalization."""

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry import ate_rmse
from ucoslam_tpu.io import SyntheticSequence
from ucoslam_tpu.slam import System
from ucoslam_tpu.mapping.frame import empty_markers

PARAMS = Params().replace(
    maxMapPoints=4096,
    maxKeyFrames=32,
    maxKeyPointsPerFrame=512,
    maxDescDistance=60.0,
    aruco_markerSize=0.5,
)


def run(seq, params=PARAMS, strip_kpts=frozenset(), strip_markers=frozenset()):
    sys_ = System(params, seq.cam)
    poses = {}
    for i in range(seq.n_frames):
        f = seq.frame(i)
        if i in strip_kpts:
            f = f._replace(valid=jnp.zeros_like(f.valid))
        if i in strip_markers:
            f = f._replace(markers=empty_markers())
        p = sys_.process_frame(f)
        if p is not None:
            poses[i] = p
    return sys_, poses


def metric_ate(poses, seq):
    idx = sorted(poses)
    est = np.stack([-poses[i][:3, :3].T @ poses[i][:3, 3] for i in idx])
    return ate_rmse(est, seq.gt_positions()[idx], with_scale=False)


def test_marker_init_recovers_metric_scale():
    seq = SyntheticSequence(n_frames=30, seed=13, n_markers=3, marker_size=0.5)
    sys_, poses = run(seq, PARAMS)
    assert len(poses) >= 0.9 * (seq.n_frames - 1)
    # markers give REAL scale (multi-view marker size-fit estimator):
    # metric ATE without scale alignment must be small
    ate = metric_ate(poses, seq)
    assert ate < 0.08, f"metric ATE {ate}"
    idx = sorted(poses)
    est = np.stack([-poses[i][:3, :3].T @ poses[i][:3, 3] for i in idx])
    ate_aligned = ate_rmse(est, seq.gt_positions()[idx], with_scale=True)
    assert ate_aligned < 0.05, f"scale-aligned ATE {ate_aligned}"
    # markers registered in the map with poses
    st = sys_.map.state
    assert int(np.asarray(st.mk_active).sum()) >= 2
    assert int(np.asarray(st.mk_pose_valid).sum()) >= 1


def test_one_frame_marker_init():
    seq = SyntheticSequence(n_frames=10, seed=14, n_markers=2, marker_size=0.5,
                            marker_noise=0.05)
    params = PARAMS.replace(aruco_allowOneFrameInitialization=True)
    sys_, poses = run(seq, params)
    # initialized on the very first frame (one-frame marker init)
    assert 0 in poses
    assert len(poses) >= 8


def test_marker_fallback_when_keypoints_die():
    seq = SyntheticSequence(n_frames=30, seed=15, n_markers=3, marker_size=0.5)
    # keypoints vanish for frames 15..19 -> marker-only pose keeps tracking
    strip = set(range(15, 20))
    sys_, poses = run(seq, PARAMS, strip_kpts=strip)
    got = [i for i in strip if i in poses]
    assert len(got) >= 3, f"marker fallback tracked only {got}"
    ate = metric_ate(poses, seq)
    assert ate < 0.1, f"metric ATE {ate}"


def test_force_initialization_from_markers():
    seq = SyntheticSequence(n_frames=20, seed=16, n_markers=0)
    params = PARAMS.replace(forceInitializationFromMarkers=True)
    sys_, poses = run(seq, params)
    # no markers present -> must refuse to initialize at all
    assert len(poses) == 0
    assert sys_.map.n_keyframes == 0
