"""Two-pass benchmark harness: map (SLAM) then evaluate (LOCALIZATION).

Counterpart of tests/test_sequence.cpp (:156-420): pass 1 runs full SLAM
over the sequence with per-frame `|@#` signature lines, then
waitForFinished + globalOptimization and a map save; pass 2 re-runs the
same sequence in MODE_LOCALIZATION and the pass-2 trajectory is what gets
evaluated (the paper's protocol). Supports the `-recovery` rollback
behavior: on tracking loss, reload the last checkpoint, rewind 15 frames
and temporarily tighten keyframe params (test_sequence.cpp:268-296).

Usage:
  python -m ucoslam_tpu.apps.test_sequence --synthetic 60 --out-dir /tmp/run
  python -m ucoslam_tpu.apps.test_sequence --dataset tum_dir --camera cam.yml \\
      --out-dir results [--recovery] [--save-every 100]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def main(argv=None) -> int:
    from ucoslam_tpu.api import UcoSlam
    from ucoslam_tpu.config import Mode, Params
    from ucoslam_tpu.io.datasets import save_trajectory_tum
    from ucoslam_tpu.apps.run_slam import load_camera_yml

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--camera")
    ap.add_argument("--params")
    ap.add_argument("--out-dir", default="results")
    ap.add_argument("--recovery", action="store_true")
    ap.add_argument("--save-every", type=int, default=0)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    os.makedirs(args.out_dir, exist_ok=True)

    params = Params.load_yml(args.params) if args.params else Params().replace(
        maxMapPoints=8192, maxKeyFrames=64, maxKeyPointsPerFrame=1024,
        maxDescDistance=60.0,
    )

    if args.synthetic:
        from ucoslam_tpu.io.synthetic import SyntheticSequence

        seq = SyntheticSequence(n_frames=args.synthetic, seed=args.seed)
        cam = seq.cam
        n = seq.n_frames
        get_img = seq.render
        stamps = [i / 30.0 for i in range(n)]
        gt_path = os.path.join(args.out_dir, "groundtruth.txt")
        save_trajectory_tum(gt_path, stamps, [seq.gt_pose(i) for i in range(n)])
    else:
        from ucoslam_tpu.io.datasets import TumSequence
        from ucoslam_tpu.geometry.camera import CameraParams

        tum = TumSequence.open(args.dataset)
        cam = (
            load_camera_yml(args.camera)
            if args.camera
            else CameraParams.create(500.0, 500.0, 320.0, 240.0)
        )
        n = len(tum)
        get_img = lambda i: tum.read_rgb(i)  # noqa: E731
        stamps = [tum.rgb[i][0] for i in range(n)]
        gt_path = os.path.join(args.dataset, "groundtruth.txt")

    map_path = os.path.join(args.out_dir, "map.slm")
    ckpt_path = os.path.join(args.out_dir, "lost_track.slm")

    # ---------------- pass 1: SLAM ----------------
    slam = UcoSlam()
    slam.setParams(None, params, cam)
    t0 = time.time()
    i = 0
    last_ckpt_frame = 0
    recovered = 0
    while i < n:
        pose = slam.process(get_img(i), fseq=i)
        fps = (i + 1) / max(time.time() - t0, 1e-9)
        print(f"|@# Image {i + 1}/{n} fps={fps:.2f} sig={slam.getSignatureStr()}", flush=True)
        if args.save_every and i > 0 and i % args.save_every == 0:
            slam.saveToFile(ckpt_path)
            last_ckpt_frame = i
        if (
            args.recovery
            and pose is None
            and slam.map.n_keyframes > 2
            and os.path.exists(ckpt_path)
            and i - last_ckpt_frame > 15
        ):
            # rollback protocol: reload checkpoint, rewind 15 frames,
            # tighten KF params temporarily (test_sequence.cpp:268-296)
            slam.readFromFile(ckpt_path, cam)
            slam._params = slam._params.replace(KFMinConfidence=0.9, KFCulling=0.9)
            i = max(last_ckpt_frame, i - 15)
            recovered += 1
            continue
        i += 1
    slam.waitForFinished()
    slam.globalOptimization()
    slam.saveToFile(map_path)
    t_map = time.time() - t0

    # ---------------- pass 2: LOCALIZATION ----------------
    slam2 = UcoSlam()
    slam2.readFromFile(map_path, cam)
    slam2.setMode(Mode.LOCALIZATION)
    slam2.resetTracker()
    t1 = time.time()
    est_stamps, est_poses = [], []
    for i in range(n):
        pose = slam2.process(get_img(i), fseq=i)
        if pose is not None:
            est_stamps.append(stamps[i])
            est_poses.append(pose)
    t_track = time.time() - t1

    est_path = os.path.join(args.out_dir, "trajectory.txt")
    save_trajectory_tum(est_path, est_stamps, est_poses)
    print(
        f"mappingFPS={n / max(t_map, 1e-9):.2f} trackingFPS={n / max(t_track, 1e-9):.2f} "
        f"tracked={len(est_poses)}/{n} recoveries={recovered}"
    )
    if os.path.exists(gt_path):
        from ucoslam_tpu.apps.compare_logs import evaluate

        out = evaluate(est_path, gt_path)
        if out:
            ate, pct, _ = out
            print(f"ATE={ate:.6f} perctFramesTracked={pct:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
