"""Sim3 pose-graph relaxation tests (the loop-closure corrector)."""

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.geometry.se3 import se3_exp
from ucoslam_tpu.geometry.sim3 import sim3_parts
from ucoslam_tpu.optim.posegraph import PoseGraphProblem, pose_graph_solve, sim3_to_se3

RNG = np.random.default_rng(61)


def ring_problem(n=12, drift_per_step=0.02, scale_drift=1.01):
    """A loop trajectory whose odometry drifts; one loop-closure edge.

    True poses form a ring; odometry edges carry the TRUE relative motion
    (so the optimum is the true ring), while the initial poses integrate a
    drifted version. The loop edge i=0 <-> j=n-1 carries truth.
    """
    true_poses = []
    for k in range(n):
        ang = 2 * np.pi * k / n
        xi = np.array([np.sin(ang), 0.0, 1 - np.cos(ang), 0.0, ang, 0.0], np.float32)
        true_poses.append(np.asarray(se3_exp(jnp.asarray(xi))))
    true_poses = np.stack(true_poses)

    # drifted initialization: accumulate noisy relative motions
    init = [true_poses[0]]
    for k in range(1, n):
        rel_true = true_poses[k] @ np.linalg.inv(true_poses[k - 1])
        noise = np.asarray(
            se3_exp(jnp.asarray(RNG.normal(0, drift_per_step, 6).astype(np.float32)))
        )
        sdrift = np.eye(4, dtype=np.float32)
        sdrift[:3, :3] *= scale_drift
        init.append(sdrift @ noise @ rel_true @ init[-1])
    init = np.stack(init)

    edges_i, edges_j, meas = [], [], []
    for k in range(1, n):
        edges_i.append(k)
        edges_j.append(k - 1)
        meas.append(true_poses[k] @ np.linalg.inv(true_poses[k - 1]) @ np.eye(4))
    # loop closure edge: 0 <-> n-1 with the true relative transform
    edges_i.append(n - 1)
    edges_j.append(0)
    meas.append(true_poses[n - 1] @ np.linalg.inv(true_poses[0]))

    # measurement is S_i S_j^-1 in Sim3; encode as given
    problem = PoseGraphProblem(
        poses=jnp.asarray(init),
        fixed=jnp.asarray(np.arange(n) == 0),
        edge_i=jnp.asarray(np.asarray(edges_i, np.int32)),
        edge_j=jnp.asarray(np.asarray(edges_j, np.int32)),
        edge_meas=jnp.asarray(np.stack(meas).astype(np.float32)),
        edge_weight=jnp.ones(len(meas)),
        edge_valid=jnp.ones(len(meas), bool),
    )
    return problem, true_poses, init


def pose_errors(est, true_poses):
    errs = []
    for a, b in zip(est, true_poses):
        s, R, t = sim3_parts(jnp.asarray(a))
        Rt = np.asarray(R)
        errs.append(np.linalg.norm((np.asarray(t) / float(s)) - b[:3, 3]))
    return np.asarray(errs)


def test_ring_drift_corrected():
    problem, true_poses, init = ring_problem()
    out = pose_graph_solve(problem, iters=25)
    est = np.asarray(sim3_to_se3(out))
    err_before = pose_errors(init, true_poses).max()
    err_after = pose_errors(est, true_poses).max()
    assert err_after < 0.05, f"after {err_after} (before {err_before})"
    assert err_after < err_before * 0.2


def test_scale_drift_recovered_by_sim3():
    problem, true_poses, init = ring_problem(scale_drift=1.03)
    out = pose_graph_solve(problem, iters=30)
    s_end = float(sim3_parts(out[-1])[0])
    # last pose accumulated ~1.03^11 scale drift; Sim3 graph should pull the
    # residual scale back near 1 after closing the loop
    est = np.asarray(sim3_to_se3(out))
    err = pose_errors(est, true_poses)
    assert err.max() < 0.1, f"err {err.max()}, end scale {s_end}"


def test_fix_scale_keeps_unit_scale():
    problem, true_poses, init = ring_problem(scale_drift=1.0)
    out = pose_graph_solve(problem, iters=20, fix_scale=True)
    s = np.asarray(sim3_parts(out)[0])
    np.testing.assert_allclose(s, 1.0, atol=1e-3)


def test_fixed_vertex_untouched():
    problem, _, init = ring_problem()
    out = pose_graph_solve(problem, iters=10)
    np.testing.assert_allclose(np.asarray(out[0]), init[0], atol=1e-6)


def test_lm_survives_adversarial_bad_loop():
    """LM damping + accept/reject (graphoptsim3.cpp:85-153): a garbage
    loop-closure measurement must not blow the graph apart — the damped
    solver rejects cost-increasing steps, so the final cost is no worse
    than the initial and every pose stays finite. (Plain GN relied on the
    caller's post-hoc chi2 rollback to survive this.)"""
    problem, true_poses, init = ring_problem(n=12)
    # corrupt the loop edge with a wildly wrong measurement
    meas = np.asarray(problem.edge_meas).copy()
    bad = np.eye(4, dtype=np.float32)
    bad[:3, 3] = [5.0, -4.0, 7.0]
    bad[:3, :3] = np.asarray(
        se3_exp(jnp.asarray(np.array([0, 0, 0, 2.5, 1.0, -1.7], np.float32)))
    )[:3, :3]
    meas[-1] = bad
    weights = np.asarray(problem.edge_weight).copy()
    weights[-1] = 50.0  # a "strongly supported" wrong loop
    p_bad = problem._replace(
        edge_meas=jnp.asarray(meas), edge_weight=jnp.asarray(weights)
    )

    def cost_of(poses, prob):
        from ucoslam_tpu.optim.posegraph import _edge_residual

        z = jnp.zeros(7)
        r = np.stack(
            [
                np.asarray(
                    _edge_residual(
                        z, z, poses[int(i)], poses[int(j)], prob.edge_meas[k]
                    )
                )
                for k, (i, j) in enumerate(
                    zip(np.asarray(prob.edge_i), np.asarray(prob.edge_j))
                )
            ]
        )
        w = np.asarray(prob.edge_weight)
        return float((w * (r**2).sum(-1)).sum())

    out = np.asarray(pose_graph_solve(p_bad, iters=25))
    assert np.isfinite(out).all()
    assert cost_of(jnp.asarray(out), p_bad) <= cost_of(p_bad.poses, p_bad) + 1e-3


def test_lm_converges_on_good_ring():
    """With damping the good-loop ring still converges to the truth."""
    from ucoslam_tpu.geometry import ate_rmse

    problem, true_poses, init = ring_problem(n=12)
    out = np.asarray(sim3_to_se3(pose_graph_solve(problem, iters=25)))

    def centers(poses):
        return np.stack([-T[:3, :3].T @ T[:3, 3] for T in poses])

    ate = ate_rmse(centers(out), centers(true_poses))
    assert ate < 0.02, f"ring ATE {ate}"
