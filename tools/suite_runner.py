"""Synthetic fleet suite: N sequences through the FULL harness chain for
both engines, aggregated with analyze_logs (+ Wilcoxon).

Counterpart of the reference's evaluation fleet — test_generator_*.sh
renders/queues sequences through tests/test_sequence, analyzeAllLogs.cpp
aggregates the per-sequence logs and wilcoxonTests.cpp runs the paired
significance test (tests/test_generator_monocular.sh:9-115). Here the
sequences are rendered synthetic scenes (varied trajectories, seeds and
modalities, including both loop geometries), each run through BOTH engines'
two-pass protocols, laid out as <out>/<method>/<sequence>/ for
apps.analyze_logs, and summarized into SUITE_r5.md.

Usage:
    python tools/suite_runner.py [--out /tmp/suite5] [--skip-ref]
        [--seq NAME ...] [--md SUITE_r5.md]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

# run_parity (imported below) captures the launch TPU-tunnel env for the
# engine children and then pins THIS parent process to CPU jax — import it
# before anything touches os.environ or jax
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools", "parity"))

from run_parity import (  # noqa: E402
    REF_DRIVER,
    evaluate,
    run_ref,
    run_tpu,
    write_ref_camera_yml,
    write_tpu_camera_yml,
)

# name -> (trajectory, frames, seed, n_points, extras)
SEQUENCES = {
    "arc_a": ("arc", 150, 5, 1600, {}),
    "arc_b": ("arc", 150, 31, 1600, {}),
    "line_a": ("line", 150, 9, 1600, {}),
    "loop_a": ("loop", 200, 7, 2000, {}),
    "sweep_back_a": ("sweep_back", 240, 5, 2200, {}),
    "orbit_out_a": ("orbit_out", 360, 5, 3000, {"recovery": True}),
    "markers_a": ("arc", 150, 13, 1600, {"markers": True}),
    "rgbd_a": ("arc", 150, 17, 1600, {"rgbd": True}),
}


def render(name, out):
    from ucoslam_tpu.io.datasets import write_synthetic_tum
    from ucoslam_tpu.io.synthetic import SyntheticSequence

    traj, frames, seed, n_pts, extras = SEQUENCES[name]
    root = os.path.join(out, "seq", name)
    kwargs = dict(
        n_frames=frames, n_points=n_pts, seed=seed, trajectory=traj
    )
    if extras.get("markers"):
        kwargs.update(n_markers=10, marker_size=0.6)
    if extras.get("rgbd"):
        from ucoslam_tpu.geometry.camera import CameraParams

        kwargs["cam"] = CameraParams.create(
            500.0, 500.0, 320.0, 240.0, width=640, height=480, bl=0.25
        )
    seq = SyntheticSequence(**kwargs)
    if not os.path.exists(os.path.join(root, "rgb.txt")):
        write_synthetic_tum(seq, root, depth=bool(extras.get("rgbd")))
    return root, seq.cam


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/suite5")
    ap.add_argument("--seq", action="append", choices=sorted(SEQUENCES))
    ap.add_argument("--skip-ref", action="store_true")
    ap.add_argument("--skip-tpu", action="store_true")
    ap.add_argument("--md", help="write the summary markdown here")
    ap.add_argument("--voc")
    args = ap.parse_args(argv)
    names = args.seq or list(SEQUENCES)
    os.makedirs(args.out, exist_ok=True)
    voc = args.voc
    if voc is None:
        from ucoslam_tpu.io.fbow import default_vocab_path

        voc = default_vocab_path()

    rows = {}
    for name in names:
        print(f"=== {name} ===", flush=True)
        traj, frames, seed, n_pts, extras = SEQUENCES[name]
        ds, cam = render(name, args.out)
        gt = os.path.join(ds, "groundtruth.txt")
        with_scale = not extras.get("rgbd") and not extras.get("markers")
        row = {}

        if not args.skip_ref and os.path.exists(REF_DRIVER):
            ref_cam = os.path.join(args.out, f"{name}_ref_cam.yml")
            write_ref_camera_yml(
                ref_cam, cam, bl=cam.bl if extras.get("rgbd") else 0.0,
                rgb_depthscale=(1 / 5000.0) if extras.get("rgbd") else None,
            )
            extra = []
            if extras.get("markers"):
                extra += ["-markers", "-aruco-size", "0.6"]
            if extras.get("rgbd"):
                extra += ["-rgbd"]
            if extras.get("recovery"):
                extra += ["-recovery"]
            pre = os.path.join(args.out, f"{name}_ref")
            try:
                st = run_ref(ds, ref_cam, pre, extra, voc=voc)
                est = pre + ".pass2.tum"
                if st.get("tracked_pass2", 0) < 10:
                    est = pre + ".pass1.tum"
                ate, pct = evaluate(est, gt, with_scale)
                # analyze_logs layout: <out>/<method>/<seq>/
                mdir = os.path.join(args.out, "reference", name)
                os.makedirs(mdir, exist_ok=True)
                shutil.copy(est, os.path.join(mdir, "trajectory.txt"))
                shutil.copy(gt, os.path.join(mdir, "groundtruth.txt"))
                row["ref"] = {
                    "ate": ate, "pct": pct, "fps": st.get("fps_pass1")
                }
                print(f"  ref: ATE={ate:.4f} tracked={pct:.1%}", flush=True)
            except subprocess.CalledProcessError as e:
                print(f"  ref FAILED: {e}", flush=True)
                row["ref"] = {"error": str(e)}

        if not args.skip_tpu:
            tpu_cam = os.path.join(args.out, f"{name}_tpu_cam.yml")
            write_tpu_camera_yml(tpu_cam, cam)
            mdir = os.path.join(args.out, "ucoslam_tpu", name)
            kwargs = {}
            if extras.get("markers"):
                from ucoslam_tpu.config import Params

                pyml = os.path.join(args.out, f"{name}_params.yml")
                Params().replace(
                    maxMapPoints=8192, maxKeyFrames=64,
                    maxKeyPointsPerFrame=1024, maxDescDistance=60.0,
                    aruco_markerSize=0.6,
                ).save_yml(pyml)
                kwargs = {"markers": True, "params": pyml}
            if extras.get("rgbd"):
                kwargs["rgbd"] = True
            if extras.get("recovery"):
                kwargs["recovery"] = True
            st = run_tpu(ds, tpu_cam, mdir, frames=frames, voc=voc, **kwargs)
            est = os.path.join(mdir, "trajectory.txt")
            shutil.copy(gt, os.path.join(mdir, "groundtruth.txt"))
            ate, pct = evaluate(est, gt, with_scale)
            row["tpu"] = {
                "ate": ate, "pct": pct, "fps": st.get("fps_map"),
                "wall_s": st["wall_s"],
            }
            print(f"  tpu: ATE={ate:.4f} tracked={pct:.1%} "
                  f"fps={st.get('fps_map')}", flush=True)
        rows[name] = row

    json.dump(rows, open(os.path.join(args.out, "suite.json"), "w"), indent=1)

    # aggregate through the production analyzer (+ Wilcoxon when both ran)
    analyze_cmd = [
        sys.executable, "-m", "ucoslam_tpu.apps.analyze_logs", args.out,
    ]
    if not args.skip_ref and not args.skip_tpu:
        analyze_cmd += ["--wilcoxon", "reference", "ucoslam_tpu"]
    an = subprocess.run(
        analyze_cmd, capture_output=True, text=True, cwd=REPO
    )
    print(an.stdout)

    if args.md:
        write_md(rows, an.stdout, args.md)
    return 0


def write_md(rows, analyzer_out, path):
    lines = [
        "# SUITE — synthetic fleet run (round 5)",
        "",
        "Per-sequence two-pass results for both engines over a rendered",
        "suite spanning both loop geometries, markers and RGB-D",
        "(the reference chain: test_generator_monocular.sh:9-115 ->",
        "analyzeAllLogs.cpp -> wilcoxonTests.cpp). Reproduce:",
        "`python tools/suite_runner.py --md SUITE_r5.md`.",
        "",
        "| sequence | ref ATE | ref tracked | ref fps | tpu ATE | tpu tracked | tpu fps |",
        "|---|---|---|---|---|---|---|",
    ]
    for name, row in rows.items():
        r = row.get("ref", {})
        t = row.get("tpu", {})

        def f(d, k, fmt="{:.4f}"):
            v = d.get(k)
            return fmt.format(v) if isinstance(v, (int, float)) else "—"

        lines.append(
            f"| {name} | {f(r, 'ate')} | {f(r, 'pct', '{:.1%}')} | "
            f"{f(r, 'fps', '{:.1f}')} | {f(t, 'ate')} | "
            f"{f(t, 'pct', '{:.1%}')} | {f(t, 'fps', '{:.1f}')} |"
        )
    lines += ["", "## analyze_logs output", "", "```", analyzer_out.rstrip(),
              "```"]
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"wrote {path}")


if __name__ == "__main__":
    sys.exit(main())
