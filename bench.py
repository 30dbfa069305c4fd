"""Single-chip benchmark: SLAM frame pipeline throughput on TPU.

Measures the two per-frame hot stages at production sizes and reports the
end-to-end frames/sec/chip:
  - ORB frontend: 640x480, 8 pyramid levels, 2048 keypoints + descriptors
  - tracking step: 16384-point map x 2048-keypoint frame projection
    matching (dense Hamming + gates) and 4x10-iteration motion-only LM

Baseline: the reference (UcoSLAM 1.0.7, C++/AVX/OpenMP) advertises
real-time operation and publishes no numbers (BASELINE.md); the canonical
real-time budget for its benchmark suites is 30 fps camera rate, so
vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from ucoslam_tpu.config import Params
    from ucoslam_tpu.features.orb import ORBExtractor
    from ucoslam_tpu.geometry.camera import CameraParams
    from ucoslam_tpu.io.synthetic import SyntheticSequence
    from ucoslam_tpu.mapping.frame import empty_frame
    from ucoslam_tpu.mapping.map import Map
    from ucoslam_tpu.slam.tracker import _track_step

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)

    # ---------- ORB frontend ----------
    seq = SyntheticSequence(n_frames=4, n_points=1500)
    img = jnp.asarray(seq.render(0))
    orb = ORBExtractor(max_features=2048, n_levels=8)
    kp = orb.detect_and_compute(img)
    kp.xy.block_until_ready()  # compile
    n_rep = 20
    t0 = time.perf_counter()
    for _ in range(n_rep):
        kp = orb.detect_and_compute(img)
    kp.xy.block_until_ready()
    t_extract = (time.perf_counter() - t0) / n_rep

    # ---------- tracking step ----------
    P, N = 16384, 2048
    params = Params().replace(maxMapPoints=P, maxKeyFrames=64, maxKeyPointsPerFrame=N)
    cam = CameraParams.create(500.0, 500.0, 320.0, 240.0)
    X = rng.uniform(-3, 3, (P, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(3, 10, P)
    desc = rng.integers(0, 2**32, (P, 8), dtype=np.uint32)
    dist = np.linalg.norm(X, axis=1)
    m = Map(params)
    m.add_points(X, X / dist[:, None], desc, dist / 1.2**7, dist * 1.05,
                 np.zeros(P, np.int32), 0)
    uv = np.asarray(cam.project(jnp.asarray(X)))[:N] + rng.normal(0, 0.3, (N, 2))
    frame = empty_frame(N)._replace(
        und_xy=jnp.asarray(uv.astype(np.float32)),
        desc=jnp.asarray(desc[:N]),
        valid=jnp.ones(N, bool),
    )
    args = (m.state, frame, cam, jnp.eye(4), jnp.float32(15.0), jnp.float32(60.0),
            jnp.float32(1.2))
    out = _track_step(*args)
    out[0].block_until_ready()
    t0 = time.perf_counter()
    for _ in range(n_rep):
        out = _track_step(*args)
    out[0].block_until_ready()
    t_track = (time.perf_counter() - t0) / n_rep

    fps = 1.0 / (t_extract + t_track)
    result = {
        "metric": "slam_frame_pipeline_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s (ORB 2048kp@640x480x8L + track 16k-pt map)",
        "vs_baseline": round(fps / 30.0, 3),
        "detail": {
            "t_extract_ms": round(t_extract * 1e3, 3),
            "t_track_ms": round(t_track * 1e3, 3),
            "n_inliers": int(out[4]),
            "device": str(dev),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
