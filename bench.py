"""Single-chip benchmark: SLAM pipeline throughput on TPU.

Measures the per-frame hot stages at production sizes plus the global-BA
optimizer (the BASELINE.md north stars measurable on one chip):
  - ORB frontend: 640x480, 8 pyramid levels, 2048 keypoints + descriptors
  - tracking step: 16384-point map x 2048-keypoint frame projection
    matching (fused Pallas kernel on TPU) and 4x10-iteration motion-only LM
  - global BA: Schur-complement LM over 128 keyframes / 16384 points /
    131072 observations -> LM iterations per second
  - sharded-BA dry-run overhead on an 8-virtual-device CPU mesh (weak
    scaling is NOT wall-clock-meaningful on this 2-core host; real ICI
    scaling efficiency needs a pod slice — this records the collective +
    reshard overhead of the production sharded path)

Baseline: the reference (UcoSLAM 1.0.7, C++/AVX/OpenMP) advertises
real-time operation and publishes no numbers (BASELINE.md); the canonical
real-time budget for its benchmark suites is 30 fps camera rate, so
vs_baseline = fps / 30.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "detail"}.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

# Persistent compilation cache: first compile of the production-sized ORB +
# BA programs costs minutes on this platform; cached runs take seconds.
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")


def _enable_compile_cache(jax):
    try:
        # bench at the precision production runs: the engine forces f32
        # matmul precision (utils/precision.py) because bf16-default
        # geometry math costs ~11x ATE in the head-to-head
        jax.config.update("jax_default_matmul_precision", "highest")
        os.makedirs(_CACHE_DIR, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception as e:  # cache is an optimization; never fail over it
        print(f"compile cache disabled: {e}", file=sys.stderr)


# Peak numbers for roofline accounting (TPU v5e / "v5 lite"; public specs:
# 197 TFLOP/s bf16, f32 through the MXU at ~1/4 rate, 819 GB/s HBM).
PEAK_F32 = 49e12
PEAK_BF16 = 197e12
PEAK_HBM = 8.19e11


def _cost_of(jax, fn, *args):
    """(flops, bytes) from XLA's cost analysis of the compiled program."""
    try:
        ca = jax.jit(fn).lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0))
    except Exception as e:  # noqa: BLE001 — roofline is best-effort
        print(f"cost analysis unavailable: {e}", file=sys.stderr)
        return None, None


def _roofline(flops, nbytes, t_sec):
    """Achieved rates + bound fractions for one stage."""
    if not flops or not t_sec:
        return {}
    tf = flops / t_sec
    gb = (nbytes or 0.0) / t_sec
    out = {
        "gflops": round(flops / 1e9, 2),
        "achieved_tflops": round(tf / 1e12, 3),
        "pct_f32_peak": round(100.0 * tf / PEAK_F32, 1),
    }
    if nbytes:
        out["hbm_gbps"] = round(gb / 1e9, 1)
        out["pct_hbm_peak"] = round(100.0 * gb / PEAK_HBM, 1)
        out["bound"] = "memory" if gb / PEAK_HBM > tf / PEAK_F32 else "compute"
    return out


def bench_frame_pipeline(jax, jnp):
    from ucoslam_tpu.config import Params
    from ucoslam_tpu.features.orb import ORBExtractor
    from ucoslam_tpu.geometry.camera import CameraParams
    from ucoslam_tpu.io.synthetic import SyntheticSequence
    from ucoslam_tpu.mapping.frame import empty_frame
    from ucoslam_tpu.mapping.map import Map
    from ucoslam_tpu.slam.tracker import _track_step

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

    # roofline accounting (XLA-counted FLOPs/bytes; BASELINE.md
    # speed-of-light north star — shows how far each stage is from light)
    fl_e, by_e = _cost_of(jax, orb.detect_and_compute, img)
    fl_t, by_t = _cost_of(jax, _track_step, *args)
    roof = {
        "extract": _roofline(fl_e, by_e, t_extract),
        "track": _roofline(fl_t, by_t, t_track),
    }
    return t_extract, t_track, int(out[4]), roof


def _make_ba_problem(jnp, n_kf=128, n_pt=16384, obs_per_pt=8):
    """Production-scale synthetic BA problem (sliding-window visibility)."""
    from ucoslam_tpu.geometry import se3_exp
    from ucoslam_tpu.geometry.camera import CameraParams
    from ucoslam_tpu.optim.ba import BAProblem

    cam = CameraParams.create(500.0, 500.0, 320.0, 240.0)
    rng = np.random.default_rng(7)
    X = rng.uniform(-4, 4, (n_pt, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(6, 16, n_pt)
    poses = []
    for k in range(n_kf):
        xi = np.array(
            [0.1 * np.sin(k * 0.1), 0.05 * np.cos(k * 0.13), 0.002 * k,
             0.005 * np.sin(k * 0.2), 0.005 * np.cos(k * 0.1), 0.0],
            np.float32,
        )
        poses.append(np.asarray(se3_exp(jnp.asarray(xi))))
    poses = np.stack(poses).astype(np.float32)
    base = (np.arange(n_pt, dtype=np.int64) * n_kf // n_pt).astype(np.int32)
    obs_cam2 = ((base[:, None] + np.arange(obs_per_pt, dtype=np.int32)) % n_kf)
    T = poses[obs_cam2]  # (P, MO, 4, 4)
    Xc = np.einsum("pmij,pj->pmi", T[:, :, :3, :3], X) + T[:, :, :3, 3]
    uv = np.stack(
        [500.0 * Xc[..., 0] / Xc[..., 2] + 320.0,
         500.0 * Xc[..., 1] / Xc[..., 2] + 240.0], -1
    ).astype(np.float32)
    uv += rng.normal(0, 0.5, uv.shape).astype(np.float32)

    O = n_pt * obs_per_pt
    poses_init = poses.copy()
    xi_n = rng.normal(0, 0.01, (n_kf, 6)).astype(np.float32)
    for k in range(1, n_kf):
        poses_init[k] = np.asarray(se3_exp(jnp.asarray(xi_n[k]))) @ poses[k]
    X_init = X + rng.normal(0, 0.05, X.shape).astype(np.float32)
    problem = BAProblem(
        cam_pose=jnp.asarray(poses_init),
        cam_fixed=jnp.asarray(np.arange(n_kf) == 0),
        cam_valid=jnp.ones(n_kf, bool),
        pt_pos=jnp.asarray(X_init),
        pt_valid=jnp.ones(n_pt, bool),
        obs_cam=jnp.asarray(obs_cam2.reshape(-1)),
        obs_pt=jnp.asarray(np.repeat(np.arange(n_pt, dtype=np.int32), obs_per_pt)),
        obs_uv=jnp.asarray(uv.reshape(O, 2)),
        obs_sigma2=jnp.ones(O),
        obs_depth=jnp.zeros(O, jnp.float32),
        obs_valid=jnp.ones(O, bool),
        pt_obs=jnp.asarray(np.arange(O, dtype=np.int32).reshape(n_pt, obs_per_pt)),
        bf=jnp.float32(50.0),
        cam_obs=jnp.asarray(
            __import__("ucoslam_tpu.optim.ba", fromlist=["_build_cam_obs"])
            ._build_cam_obs(obs_cam2.reshape(-1), n_kf, O)
        ),
    )
    return problem, cam


def _ba_iter_time(jax, jnp, problem, cam):
    """Marginal LM-iteration time + convergence check for one problem."""
    from ucoslam_tpu.optim.ba import ba_solve

    # multiples of the pm solver's relinearization cadence (6) so the
    # marginal cost measures steady-state macro steps
    lo, hi = 6, 24
    r = ba_solve(problem, cam, iters=lo, stages=1)
    r.cam_pose.block_until_ready()  # compile iters=lo
    r = ba_solve(problem, cam, iters=hi, stages=1)
    r.cam_pose.block_until_ready()  # compile iters=hi
    t0 = time.perf_counter()
    r = ba_solve(problem, cam, iters=lo, stages=1)
    r.cam_pose.block_until_ready()
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    r = ba_solve(problem, cam, iters=hi, stages=1)
    r.cam_pose.block_until_ready()
    t_hi = time.perf_counter() - t0
    t_iter = (t_hi - t_lo) / (hi - lo)  # marginal cost per LM iteration
    converged = float(np.asarray(r.cost_history)[-1]) < float(
        np.asarray(r.cost_history)[0]
    )
    # roofline accounting against the path ba_solve actually dispatches to
    # (the pm fast path is selected host-side, so the jitted cost analysis
    # must target the inner solver directly)
    from ucoslam_tpu.optim.schur_pm import pm_problem_for, pm_staged_lm

    V = problem.cam_pose.shape[0]
    pm = pm_problem_for(problem) if V >= 128 else None
    if pm is not None:
        fl, by = _cost_of(
            jax, lambda q: pm_staged_lm(q, cam, iters=6, stages=1), pm
        )
        fl, by = fl / 6.0, by / 6.0
    else:
        fl, by = _cost_of(
            jax,
            lambda p: ba_solve(p, cam, iters=1, stages=1, solver="dense"),
            problem,
        )
    roof = _roofline(fl, by, t_iter) if fl else {}
    return t_iter, converged, roof


def bench_global_ba(jax, jnp):
    """Global-BA LM iterations/sec at two scales: the mapping-rate window
    (128 kf) and the reference-suite map (1024 kf x 131k pts x 1M obs —
    KITTI-00 scale, VERDICT r2 item #2: target < 100 ms / LM iter)."""
    problem, cam = _make_ba_problem(jnp)
    t_iter, converged, roof = _ba_iter_time(jax, jnp, problem, cam)
    out = {
        "ba_iters_per_sec": round(1.0 / max(t_iter, 1e-9), 2),
        "ba_t_iter_ms": round(t_iter * 1e3, 3),
        "ba_problem": "128kf x 16384pt x 131072obs",
        "ba_cost_decreased": bool(converged),
        "ba_roofline": roof,
    }
    try:
        # intermediate (512 kf) problem: headroom evidence between the
        # mapping window and the reference-suite scale (VERDICT r4 item 7)
        mid, cam_m = _make_ba_problem(jnp, n_kf=512, n_pt=65536, obs_per_pt=8)
        t_mid, conv_m, _ = _ba_iter_time(jax, jnp, mid, cam_m)
        out.update(
            ba_512_t_iter_ms=round(t_mid * 1e3, 3),
            ba_512_problem="512kf x 65536pt x 524288obs",
            ba_512_cost_decreased=bool(conv_m),
        )
    except Exception as e:  # noqa: BLE001
        out["ba_512_error"] = str(e)[:200]
    try:
        big, cam_b = _make_ba_problem(jnp, n_kf=1024, n_pt=131072, obs_per_pt=8)
        t_big, conv_b, roof_b = _ba_iter_time(jax, jnp, big, cam_b)
        out.update(
            ba_big_t_iter_ms=round(t_big * 1e3, 3),
            ba_big_problem="1024kf x 131072pt x 1048576obs",
            ba_big_cost_decreased=bool(conv_b),
            ba_big_roofline=roof_b,
        )
        from ucoslam_tpu.optim.schur_pm import pm_problem_for

        pm_b = pm_problem_for(big)
        if pm_b is not None:
            # pair count feeds the sharded-pm ICI model (bench_scaling)
            out["ba_big_np_pairs"] = int(pm_b.pair_m1.shape[0])
            # the skew cap (build_pm_problem) keeps loopy graphs on the
            # fast path; report what it dropped (0 on this uniform graph)
            out["ba_big_dropped_obs"] = int(pm_b.dropped_obs)
    except Exception as e:  # noqa: BLE001 — big-map bench is best-effort
        out["ba_big_error"] = str(e)[:200]
    return out


_SCALING_SCRIPT = r"""
import os
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import json, time
import numpy as np
import jax, jax.numpy as jnp
# the axon sitecustomize (already run at interpreter startup) may have
# force-set jax_platforms; pin CPU explicitly or this child grabs the
# parent's TPU tunnel
jax.config.update("jax_platforms", "cpu")
from bench import _make_ba_problem, _enable_compile_cache
_enable_compile_cache(jax)
from ucoslam_tpu.optim.ba import ba_solve
from ucoslam_tpu.parallel import make_mesh, shard_ba_problem, sharded_ba_solve

problem, cam = _make_ba_problem(jnp, n_kf=16, n_pt=1024, obs_per_pt=6)


def timed(fn):
    fn()  # compile
    t0 = time.perf_counter(); fn(); return time.perf_counter() - t0


def sharded(n):
    mesh = make_mesh(n)
    prob = shard_ba_problem(problem, n)
    return timed(lambda: sharded_ba_solve(prob, cam, mesh, iters=5, stages=1)
                 .cam_pose.block_until_ready())


t1 = timed(lambda: ba_solve(problem, cam, iters=5, stages=1)
           .cam_pose.block_until_ready())
t8 = sharded(8)
print(json.dumps({
    "sharded_dryrun": {
        "t_single_cpu_s": round(t1, 4),
        "t_sharded8_virtualcpu_s": round(t8, 4),
        "note": "8 virtual devices on a 2-core CPU host exercise the "
                "production sharded path end-to-end but carry XLA-CPU "
                "collective/runtime overhead; ICI scaling efficiency "
                "needs real chips (apps/bench_scaling.py)",
    }
}))
"""


def bench_sharded_overhead():
    """Run the 8-virtual-device sharded BA in a CPU subprocess and report
    its overhead vs single-device on the same problem. NOT a scaling
    number (2 CPU cores, virtual devices timeshare) — it bounds the
    collective/reshard cost of the production sharded path."""
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    try:
        out = subprocess.run(
            [sys.executable, "-c", _SCALING_SCRIPT],
            capture_output=True, text=True, timeout=360, env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        line = out.stdout.strip().splitlines()[-1]
        return json.loads(line)
    except Exception as e:  # noqa: BLE001 — bench must not die on the aux metric
        return {"sharded_overhead_error": str(e)[:200]}


def main():
    import jax
    import jax.numpy as jnp

    _enable_compile_cache(jax)
    dev = jax.devices()[0]
    t_extract, t_track, n_inliers, roof = bench_frame_pipeline(jax, jnp)
    ba = bench_global_ba(jax, jnp)
    sharded = bench_sharded_overhead()

    # Per-LM-step collectives of the sharded CG Schur solver at the
    # big-map size (V vertices): one psum of Hv+bv+b_corr+DK (84V floats)
    # plus cg_iters psums of (V, 6). The small per-CG-iteration psums are
    # LATENCY-bound, not bandwidth-bound: a ring all-reduce costs
    # 2(N-1) hops of ~1 us each plus 2(N-1)/N of the payload over ~90 GB/s
    # effective ICI bandwidth per v5e chip. eff(N) = (T1/N)/(T1/N + t_ici)
    # APPLIED AT N = 4/8/64 (the r3 bench evaluated the formula at N=1,
    # which is 1.0 by construction — VERDICT r3 weak #5).
    V, CGI = 1024, 32
    HOP_LAT, ICI_BW = 1e-6, 90e9
    NP = ba.get("ba_big_np_pairs", 24 * V)  # unique covis camera pairs
    RELIN = 6  # sharded-pm relinearization period (amortizes the S psum)

    def t_allreduce(nbytes, n):
        if n <= 1:
            return 0.0
        return 2 * (n - 1) * HOP_LAT + nbytes * 2 * (n - 1) / n / ICI_BW

    bytes_cg = 4 * (84 * V + CGI * 6 * V)
    bytes_dense = 4 * (36 * V * V + 48 * V)
    t_iter_big = ba.get("ba_big_t_iter_ms", 0.0) / 1e3
    eff = {}
    for n in (4, 8, 64):
        # general sharded solver: one 84V psum + CGI latency-bound (V, 6)
        # psums per LM step (the r4 finding: latency caps scaling at ~8)
        t_gen = t_allreduce(4 * 84 * V, n) + CGI * t_allreduce(4 * 6 * V, n)
        # sharded point-major solver (parallel/sharded_pm.py, the
        # production big-map path): per LM step one (V, 12) psum + one
        # scalar psum, plus ONE (V, 72) + (NP, 36) S psum per RELIN steps;
        # ZERO collectives inside CG (verified by test_sharded_pm.py's
        # HLO all-reduce count gate)
        t_pm = (
            t_allreduce(4 * 12 * V, n)
            + t_allreduce(4, n)
            + (t_allreduce(4 * 72 * V, n) + t_allreduce(4 * 36 * NP, n)) / RELIN
        )
        for tag, t_ici_n in (("", t_pm), ("_general", t_gen)):
            eff[f"eff_{n}{tag}"] = (
                round((t_iter_big / n) / (t_iter_big / n + t_ici_n), 4)
                if t_iter_big
                else None
            )
            eff[f"t_ici_{n}{tag}_us"] = round(t_ici_n * 1e6, 1)
    ici_model = {
        "psum_bytes_per_lm_step_general_cg": bytes_cg,
        "psum_bytes_per_lm_step_dense_S": bytes_dense,
        "psum_bytes_per_lm_step_pm": 4 * (12 * V + 1)
        + 4 * (72 * V + 36 * NP) // RELIN,
        "np_pairs": NP,
        "model": "t_allreduce(b, N) = 2(N-1)*1us + b*2(N-1)/N / 90GB/s; "
                 "pm: (V,12)+scalar psum per LM step + (V,72)+(NP,36) "
                 "per relinearization, no per-CG-iteration collectives; "
                 "general: 84V psum + cg_iters (V,6) psums per step",
        **eff,
        "note": "projected_scaling_efficiency at N chips with the "
                "per-chip compute T1/N from the measured big-map LM "
                "iteration; eff_N is the production sharded-pm path, "
                "eff_N_general the r4 per-CG-psum design kept for "
                "comparison",
    }

    fps = 1.0 / (t_extract + t_track)
    result = {
        "metric": "slam_frame_pipeline_fps_per_chip",
        "value": round(fps, 2),
        "unit": "frames/s (ORB 2048kp@640x480x8L + track 16k-pt map)",
        "vs_baseline": round(fps / 30.0, 3),
        "detail": {
            "t_extract_ms": round(t_extract * 1e3, 3),
            "t_track_ms": round(t_track * 1e3, 3),
            "n_inliers": n_inliers,
            "device": str(dev),
            "roofline": roof,
            **ba,
            **sharded,
            "ici_model": ici_model,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
