"""Stereo frontend: L/R row matching -> depth; stereo SLAM E2E."""

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.features.frame_extractor import FrameExtractor
from ucoslam_tpu.geometry import ate_rmse
from ucoslam_tpu.io import SyntheticSequence
from ucoslam_tpu.slam import System

PARAMS = Params().replace(
    maxMapPoints=4096, maxKeyFrames=32, maxKeyPointsPerFrame=512,
    maxDescDistance=60.0, detectMarkers=False, nOctaveLevels=4,
)


def test_stereo_depth_from_row_matching():
    seq = SyntheticSequence(n_frames=2, seed=31, n_points=600)
    assert seq.cam.bl > 0
    left, right = seq.render_stereo(0)
    fe = FrameExtractor(PARAMS, seq.cam)
    f = fe.process_stereo(left, right, 0)
    depth = np.asarray(f.depth)
    valid = np.asarray(f.valid) & (depth > 0)
    assert valid.sum() > 100, f"only {valid.sum()} stereo depths"
    # compare against true depth of the scene surface at those pixels:
    # reproject the keypoints with their measured depth and check they land
    # near a true scene point
    uv = np.asarray(f.und_xy)[valid]
    d = depth[valid]
    cam_pts = np.asarray(seq.cam.unproject(jnp.asarray(uv), jnp.asarray(d)))
    T = seq.gt_pose(0)
    world = cam_pts @ np.linalg.inv(T)[:3, :3].T + np.linalg.inv(T)[:3, 3]
    from scipy.spatial import cKDTree

    tree = cKDTree(seq.points)
    dist, _ = tree.query(world)
    assert np.median(dist) < 0.4, f"median nearest-scene dist {np.median(dist)}"


def test_stereo_slam_metric_scale():
    """Oracle stereo (per-keypoint depth) -> metric trajectory."""
    seq = SyntheticSequence(n_frames=25, seed=33, depth_mode="stereo")
    sys_ = System(PARAMS.replace(nOctaveLevels=8), seq.cam)
    poses = {}
    for i in range(seq.n_frames):
        p = sys_.process_frame(seq.frame(i))
        if p is not None:
            poses[i] = p
    assert len(poses) >= 0.9 * (seq.n_frames - 1)
    idx = sorted(poses)
    est = np.stack([-poses[i][:3, :3].T @ poses[i][:3, 3] for i in idx])
    ate = ate_rmse(est, seq.gt_positions()[idx], with_scale=False)
    assert ate < 0.05, f"stereo metric ATE {ate}"
