"""Map utility tests: median depth, unused-keypoint strip, PLY/PCD export."""

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry import CameraParams
from ucoslam_tpu.mapping import Map
from ucoslam_tpu.mapping.frame import empty_frame

SMALL = Params().replace(maxMapPoints=64, maxKeyFrames=8, maxKeyPointsPerFrame=32)


def build_small_map():
    m = Map(SMALL)
    rng = np.random.default_rng(1)
    X = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(2, 8, 10)
    slots = m.add_points(
        X, np.zeros((10, 3)), np.zeros((10, 8), np.uint32),
        np.zeros(10), np.ones(10) * 100, np.zeros(10, np.int32), 0,
    )
    ids = np.full(32, -1, np.int32)
    ids[:10] = slots
    f = empty_frame(32)._replace(
        valid=jnp.ones(32, bool), ids=jnp.asarray(ids)
    )
    m.add_keyframe(f)
    return m, X


def test_frame_median_depth():
    m, X = build_small_map()
    assert abs(m.frame_median_depth(0) - np.median(X[:, 2])) < 1e-4


def test_remove_unused_keypoints():
    m, _ = build_small_map()
    n = m.remove_unused_keypoints()
    assert n == 22  # 32 valid - 10 assigned
    assert int(np.asarray(m.state.kf_kpt_valid[0]).sum()) == 10


def test_export_ply_pcd(tmp_path):
    m, X = build_small_map()
    ply = str(tmp_path / "m.ply")
    pcd = str(tmp_path / "m.pcd")
    m.export_pointcloud(ply)
    m.export_pointcloud(pcd)
    txt = open(ply).read()
    assert txt.startswith("ply") and "element vertex 11" in txt  # 10 pts + 1 kf
    lines = open(pcd).read().splitlines()
    assert lines[0].startswith("# .PCD")
    assert any(l.startswith("POINTS 11") for l in lines)


def test_map_export_cli(tmp_path):
    import os
    import subprocess
    import sys

    from ucoslam_tpu.io.serialize import save_map

    m, _ = build_small_map()
    p = str(tmp_path / "m.slm")
    save_map(m, p)
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "-m", "ucoslam_tpu.apps.map_export", p,
         "--ply", str(tmp_path / "o.ply"), "--strip-unused", str(tmp_path / "s.slm")],
        env=env, capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr[-1500:]
    assert "10 points, 1 keyframes" in r.stdout
    assert (tmp_path / "o.ply").exists() and (tmp_path / "s.slm").exists()
