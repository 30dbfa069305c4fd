"""Head-to-head parity: reference UcoSLAM (C++) vs ucoslam_tpu on
identical rendered sequences.

Renders synthetic sequences to disk, runs BOTH engines over the same
images with the same camera calibration, scores each trajectory against
ground truth with the same Horn-1987 ATE semantics as the reference
(tests/logtools.cpp:153,291), and writes PARITY.md.

Usage:
    python tools/parity/run_parity.py [--out /tmp/parity] [--frames 150]
        [--scenario mono|markers|stereo ...] [--update-md]

The reference binary is built by tools/parity/build_ref_driver.sh into
/tmp/refbuild/ref_driver (out-of-tree; /root/reference untouched).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

# The PARENT never touches the TPU: the axon worker tolerates exactly one
# client process, and the engine subprocess must be it. Renders/evaluation
# here run on CPU jax. Capture the launch env FIRST — the engine child
# must get the ORIGINAL tunnel config back (deleting the vars makes jax
# silently fall back to XLA:CPU in the child, which poisons every fps
# measurement while leaving ATE plausible).
TPU_ENV = {
    k: os.environ.get(k)
    for k in ("JAX_PLATFORMS", "PALLAS_AXON_POOL_IPS")
}
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, REPO)
REF_DRIVER = os.environ.get("REF_DRIVER", "/tmp/refbuild/ref_driver")


def write_ref_camera_yml(path, cam, bl=None, rgb_depthscale=None):
    """OpenCV FileStorage YML the reference ImageParams reads
    (imageparams.cpp:132-176). bl MUST be 0 for monocular runs: a nonzero
    baseline routes the reference into its stereo/depth init path
    (System dispatch checks ImageParams::bl) which never initializes
    without per-keypoint depth."""
    fx, fy = float(cam.fx), float(cam.fy)
    cx, cy = float(cam.cx), float(cam.cy)
    if bl is None:
        bl = 0.0
    with open(path, "w") as f:
        f.write(
            "%YAML:1.0\n---\n"
            f"image_width: {cam.width}\n"
            f"image_height: {cam.height}\n"
            "camera_matrix: !!opencv-matrix\n"
            "   rows: 3\n   cols: 3\n   dt: f\n"
            f"   data: [ {fx}, 0., {cx}, 0., {fy}, {cy}, 0., 0., 1. ]\n"
            "distortion_coefficients: !!opencv-matrix\n"
            "   rows: 1\n   cols: 5\n   dt: f\n"
            "   data: [ 0., 0., 0., 0., 0. ]\n"
            f"baseline: {float(bl)}\n"
            + (
                f"rgb_depthscale: {float(rgb_depthscale)}\n"
                if rgb_depthscale
                else ""
            )
        )


def write_tpu_camera_yml(path, cam):
    with open(path, "w") as f:
        f.write(
            f"fx: {float(cam.fx)}\nfy: {float(cam.fy)}\n"
            f"cx: {float(cam.cx)}\ncy: {float(cam.cy)}\n"
            f"width: {cam.width}\nheight: {cam.height}\nbl: {float(cam.bl)}\n"
        )


def evaluate(est, gt, with_scale=True):
    from ucoslam_tpu.apps.compare_logs import evaluate as ev

    out = ev(est, gt, with_scale)
    if out is None:
        return float("nan"), 0.0
    return out[0], out[1]


def run_ref(dataset, camyml, out_prefix, extra, voc=None):
    t0 = time.time()
    cmd = [REF_DRIVER, dataset, camyml, out_prefix] + extra
    if voc:
        cmd += ["-voc", voc]
    subprocess.run(cmd, check=True, capture_output=True, timeout=3600)
    stats = json.load(open(out_prefix + ".stats"))
    stats["wall_s"] = time.time() - t0
    return stats


def run_tpu(dataset, camyml, out_dir, stereo=False, markers=False, frames=0,
            voc=None, params=None, rgbd=False, recovery=False):
    """Run our engine through the production CLI harness (two-pass).

    Runs as a SUBPROCESS: the TPU tunnel client must own the process —
    sharing one process between the scenario renderer's jax context and
    the engine run destabilizes the axon worker (observed crashes)."""
    argv = [sys.executable, "-m", "ucoslam_tpu.apps.test_sequence",
            "--dataset", dataset, "--out-dir", out_dir, "--camera", camyml,
            "--voc", voc or "none"]
    if params:
        argv += ["--params", params]
    if stereo:
        argv += ["--stereo", "--format", "euroc"]
    else:
        argv += ["--format", "tum"]
    if rgbd:
        argv += ["--rgbd"]
    if recovery:
        # checkpoints are what the rollback protocol rewinds to — without
        # --save-every the recovery flag is inert (test_sequence.py:230-236)
        argv += ["--recovery", "--save-every", "40"]
    t0 = time.time()
    env = dict(os.environ)
    # hand the TPU back to the child: restore the ORIGINAL launch values
    # (popping them entirely breaks tunnel discovery -> CPU fallback)
    for k, v in TPU_ENV.items():
        if v is not None:
            env[k] = v
        else:
            env.pop(k, None)
    os.makedirs(out_dir, exist_ok=True)
    logp = os.path.join(out_dir, "run.log")
    with open(logp, "w") as lf:
        r = subprocess.run(
            argv, timeout=7200, cwd=REPO, env=env, stdout=lf,
            stderr=subprocess.STDOUT,
        )
    assert r.returncode == 0, f"test_sequence failed rc={r.returncode} (see {logp})"
    out = {"wall_s": time.time() - t0}
    import re

    log_text = open(logp).read()
    m = re.search(r"mappingFPS=([\d.]+) trackingFPS=([\d.]+)", log_text)
    if m:
        # SLAM (mapping) pass fps — same definition as the reference's
        # fps_pass1 (tests/test_sequence.cpp:226-253 wall-clock fps)
        out["fps_map"] = float(m.group(1))
        out["fps_track"] = float(m.group(2))
    m = re.search(r"steadyFPS=([\d.]+)", log_text)
    if m:
        # warm-session fps (median per-frame wall time past the first 20
        # frames): the engine's sustained host speed once the one-time TPU
        # tunnel attach + XLA compile-cache misses are paid
        out["fps_steady"] = float(m.group(1))
    return out


SCENARIOS = ("mono", "markers", "stereo", "rgbd", "loop", "loop_easy")


def build_scenario(name, out, frames, seed=5):
    """Render the sequence; -> (dataset_dir, gt_path, ref_args, tpu_kwargs, cam)."""
    from ucoslam_tpu.io.synthetic import SyntheticSequence
    from ucoslam_tpu.io.datasets import write_synthetic_tum, write_synthetic_euroc

    root = os.path.join(out, name)
    if name == "mono":
        seq = SyntheticSequence(n_frames=frames, n_points=1600, seed=seed)
        if not os.path.exists(os.path.join(root, "rgb.txt")):
            write_synthetic_tum(seq, root)
        return root, os.path.join(root, "groundtruth.txt"), [], {}, seq.cam
    if name == "markers":
        seq = SyntheticSequence(
            n_frames=frames, n_points=1600, n_markers=10, marker_size=0.6,
            seed=seed,
        )
        if not os.path.exists(os.path.join(root, "rgb.txt")):
            write_synthetic_tum(seq, root)
        # our engine needs the marker size through Params (the reference
        # driver takes -aruco-size); write a params YML carrying the
        # harness defaults + the marker size
        from ucoslam_tpu.config import Params

        pyml = os.path.join(out, "markers_params.yml")
        Params().replace(
            maxMapPoints=8192, maxKeyFrames=64, maxKeyPointsPerFrame=1024,
            maxDescDistance=60.0, aruco_markerSize=0.6,
        ).save_yml(pyml)
        return (
            root,
            os.path.join(root, "groundtruth.txt"),
            ["-markers", "-aruco-size", "0.6"],
            {"markers": True, "params": pyml},
            seq.cam,
        )
    if name == "rgbd":
        # first-class RGB-D mode (reference ucoslam.cpp:23-27 processRGBD,
        # ingest frameextractor.cpp:2688-2815): exact z-buffer depth
        # written as TUM 16-bit PNGs (scale 5000)
        from ucoslam_tpu.geometry.camera import CameraParams

        cam = CameraParams.create(
            500.0, 500.0, 320.0, 240.0, width=640, height=480, bl=0.25
        )
        seq = SyntheticSequence(cam=cam, n_frames=frames, n_points=1600,
                                seed=seed)
        if not os.path.exists(os.path.join(root, "depth.txt")):
            write_synthetic_tum(seq, root, depth=True)
        return (
            root,
            os.path.join(root, "groundtruth.txt"),
            ["-rgbd"],
            {"rgbd": True},
            seq.cam,
        )
    if name == "loop":
        # revisit/loop-closure geometry (VERDICT r4 item 2): the camera
        # orbits inside an outward-facing feature cylinder — features
        # continuously leave the view, drift accumulates, and the seam at
        # the orbit's close must be absorbed by loop closure
        # (loopdetector.cpp:3024 correctMap); both engines run with their
        # recovery protocol enabled (tests/test_sequence.cpp:268-296)
        seq = SyntheticSequence(
            n_frames=frames, n_points=3000, seed=seed,
            trajectory="orbit_out",
        )
        if not os.path.exists(os.path.join(root, "rgb.txt")):
            write_synthetic_tum(seq, root)
        return (
            root,
            os.path.join(root, "groundtruth.txt"),
            ["-recovery"],
            {"recovery": True},
            seq.cam,
        )
    if name == "loop_easy":
        # gentle revisit (VERDICT r5 ask): an inward-looking sweep that
        # returns to its start with generous frame overlap — the reference
        # survives it, so this row compares loop-seam map correction
        # (correctMap, loopdetector.cpp:3024-3081) rather than mutual
        # tracking collapse like the orbit scenario
        seq = SyntheticSequence(
            n_frames=frames, n_points=2200, seed=seed,
            trajectory="sweep_back",
        )
        if not os.path.exists(os.path.join(root, "rgb.txt")):
            write_synthetic_tum(seq, root)
        return (
            root,
            os.path.join(root, "groundtruth.txt"),
            [],
            {},
            seq.cam,
        )
    if name == "stereo":
        from ucoslam_tpu.geometry.camera import CameraParams

        # baseline 0.25: the reference's stereo init needs CLOSE points
        # (z < 40*bl, imageparams.h:105); the scene sits at 3-8 m, so
        # bl=0.1 would leave the close-point test starved and its
        # depth-init path never fires (verified via shim on libucoslam)
        cam = CameraParams.create(
            500.0, 500.0, 320.0, 240.0, width=640, height=480, bl=0.25
        )
        seq = SyntheticSequence(cam=cam, n_frames=frames, n_points=1600,
                                seed=seed, depth_mode="stereo")
        if not os.path.exists(os.path.join(root, "mav0")):
            write_synthetic_euroc(seq, root, stereo=True)
        gt = os.path.join(root, "gt_tum.txt")
        if not os.path.exists(gt):
            from ucoslam_tpu.io.datasets import save_trajectory_tum

            save_trajectory_tum(
                gt, [i / 20.0 for i in range(seq.n_frames)],
                [seq.gt_pose(i) for i in range(seq.n_frames)],
            )
        return root, gt, ["-stereo"], {"stereo": True}, seq.cam
    raise ValueError(name)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/parity")
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--scenario", action="append", choices=SCENARIOS)
    ap.add_argument("--update-md", action="store_true",
                    help="rewrite PARITY.md in the repo root")
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true")
    ap.add_argument("--voc", help=".fbow vocabulary for BOTH engines "
                    "(default: bundled data/vocab.fbow; without one the "
                    "reference crashes in its MODE_LOCALIZATION pass)")
    args = ap.parse_args(argv)
    scenarios = args.scenario or list(SCENARIOS)
    os.makedirs(args.out, exist_ok=True)
    voc = args.voc
    if voc is None:
        from ucoslam_tpu.io.fbow import default_vocab_path

        voc = default_vocab_path()
    if voc is None:
        # last resort: random flat vocab keeps the reference pass-2 alive
        from ucoslam_tpu.io.fbow import save_fbow

        voc = os.path.join(args.out, "random_vocab.fbow")
        rng = np.random.default_rng(0)
        save_fbow(voc, rng.integers(0, 2**32, (512, 8), dtype=np.uint32))
    print(f"vocabulary: {voc}")

    results = {}
    for name in scenarios:
        print(f"=== scenario {name} ===", flush=True)
        # the loop scenario needs a full orbit for the seam to exist;
        # the gentle revisit needs the full out-and-back sweep
        n_frames = {"loop": 360, "loop_easy": 240}.get(name, args.frames)
        ds, gt, ref_extra, tpu_kwargs, cam = build_scenario(
            name, args.out, n_frames
        )
        ref_cam = os.path.join(args.out, f"{name}_ref_cam.yml")
        tpu_cam = os.path.join(args.out, f"{name}_tpu_cam.yml")
        metric_depth = tpu_kwargs.get("stereo") or tpu_kwargs.get("rgbd")
        write_ref_camera_yml(
            ref_cam, cam, bl=cam.bl if metric_depth else 0.0,
            rgb_depthscale=(1.0 / 5000.0) if tpu_kwargs.get("rgbd") else None,
        )
        write_tpu_camera_yml(tpu_cam, cam)
        r = {}
        with_scale = not metric_depth and not tpu_kwargs.get("markers")
        if not args.skip_ref:
            pre = os.path.join(args.out, f"{name}_ref")
            st = run_ref(ds, ref_cam, pre, ref_extra, voc=voc)
            # evaluate pass 2 (the protocol's evaluated trajectory); fall
            # back to pass 1 if localization lost everything
            est = pre + ".pass2.tum"
            if st.get("tracked_pass2", 0) < 10:
                est = pre + ".pass1.tum"
            ate, pct = evaluate(est, gt, with_scale)
            r["ref"] = {
                "ate": ate, "tracked_pct": pct,
                "fps": st.get("fps_pass1"), "stats": st,
            }
            print(f"  ref: ATE={ate:.4f} tracked={pct:.2%} "
                  f"fps={st.get('fps_pass1'):.1f}", flush=True)
        if not args.skip_tpu:
            out_dir = os.path.join(args.out, f"{name}_tpu")
            st = run_tpu(ds, tpu_cam, out_dir, frames=n_frames, voc=voc, **tpu_kwargs)
            est = os.path.join(out_dir, "trajectory.txt")
            ate, pct = evaluate(est, gt, with_scale)
            r["tpu"] = {"ate": ate, "tracked_pct": pct,
                        "wall_s": st["wall_s"], "fps": st.get("fps_map"),
                        "fps_steady": st.get("fps_steady"),
                        "fps_track": st.get("fps_track")}
            print(f"  tpu: ATE={ate:.4f} tracked={pct:.2%} "
                  f"fps={st.get('fps_map')} steady={st.get('fps_steady')}",
                  flush=True)
        results[name] = r

    out_json = os.path.join(args.out, "parity.json")
    json.dump(results, open(out_json, "w"), indent=1)
    print(json.dumps(results, indent=1))

    if args.update_md:
        write_md(results, args.frames)
    return 0


def write_md(results, frames):
    lines = [
        "# PARITY — head-to-head vs the reference UcoSLAM (C++)",
        "",
        "Both engines run on IDENTICAL rendered image sequences "
        f"({frames} frames, 640x480) with the same camera YML; the "
        "reference is the unmodified `libucoslam.so` built out-of-tree "
        "from /root/reference (tools/parity/build_ref_driver.sh) driven "
        "by tools/parity/ref_driver.cpp implementing its own two-pass "
        "protocol (tests/test_sequence.cpp:157-420). ATE is Horn-1987 "
        "aligned RMSE vs exact synthetic ground truth "
        "(tests/logtools.cpp:153,291 semantics; scale-aligned for mono, "
        "metric for stereo/markers). Reproduce: "
        "`bash tools/parity/build_ref_driver.sh && python "
        "tools/parity/run_parity.py --update-md`.",
        "",
        "| scenario | engine | ATE (m) | % frames tracked | host fps (all-in) | host fps (steady) |",
        "|---|---|---|---|---|---|",
    ]
    for name, r in results.items():
        for eng in ("ref", "tpu"):
            if eng not in r:
                continue
            e = r[eng]

            def f(v):
                return f"{v:.1f}" if v else "—"

            lines.append(
                f"| {name} | {'reference (C++)' if eng == 'ref' else 'ucoslam_tpu'} "
                f"| {e['ate']:.4f} | {e['tracked_pct']:.1%} | {f(e.get('fps'))} "
                f"| {f(e.get('fps_steady', e.get('fps')))} |"
            )
    lines += [
        "",
        "Notes: host fps is each engine's SLAM-pass wall-clock fps on this "
        "machine (2-core host; ucoslam_tpu drives one remote-attached TPU "
        "chip through the production CLI). ucoslam_tpu's all-in number "
        "pays two one-time session costs the in-process C++ engine does "
        "not: the ~90 s TPU tunnel attach and any XLA compile-cache "
        "misses; `steady` is the sustained speed after warmup (median "
        "per-frame wall time past frame 20). For the reference both "
        "numbers coincide. Chip-side kernel throughput is benchmarked "
        "separately in BENCH.",
    ]
    with open(os.path.join(REPO, "PARITY.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote PARITY.md")


if __name__ == "__main__":
    sys.exit(main())
