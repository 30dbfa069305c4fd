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


def test_stereo_subpixel_depth_accuracy():
    """Metric gate: subpixel-refined stereo depth within 1% RMS of the
    true z-buffer out to 20x baseline, on surface-interior keypoints
    (BASELINE configs[1] precision demand; reference subpixel refinement
    frameextractor.cpp:1456-2595). Keypoints at occlusion boundaries have
    no single true depth and are excluded via a z-buffer-flatness check."""
    seq = SyntheticSequence(n_frames=4, seed=31, n_points=600)
    # widen the baseline so the scene (z ~ 4-8 m) sits at <= 20x baseline
    seq.cam = seq.cam._replace(bl=0.3)
    fe = FrameExtractor(PARAMS, seq.cam)
    rels = []
    for i in range(seq.n_frames):
        left, right = seq.render_stereo(i)
        _, dep = seq.render_with_depth(i)
        f = fe.process_stereo(left, right, i)
        xy = np.asarray(f.xy)
        depth = np.asarray(f.depth)
        valid = np.asarray(f.valid) & (depth > 0)
        xi = np.clip(np.round(xy[:, 0]).astype(int), 2, dep.shape[1] - 3)
        yi = np.clip(np.round(xy[:, 1]).astype(int), 2, dep.shape[0] - 3)
        neigh = np.stack(
            [dep[yi + dy, xi + dx] for dy in (-2, -1, 0, 1, 2)
             for dx in (-2, -1, 0, 1, 2)], -1,
        )
        flat = (neigh > 0).all(-1) & (
            (neigh.max(-1) - neigh.min(-1)) < 0.02 * neigh.min(-1).clip(1e-6)
        )
        true_d = neigh.mean(-1)
        sel = valid & flat & (true_d < 20.0 * seq.cam.bl)
        rels.append((depth[sel] - true_d[sel]) / true_d[sel])
    rel = np.concatenate(rels)
    assert len(rel) > 40, f"only {len(rel)} interior stereo depths"
    rms = float(np.sqrt(np.mean(rel**2)))
    assert rms < 0.01, f"relative depth RMS {rms:.4f} at <=20x baseline"


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
