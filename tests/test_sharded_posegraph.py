"""Sharded Sim3 pose graph: 8-virtual-device solve matches single-device."""

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.geometry.se3 import se3_exp
from ucoslam_tpu.optim.posegraph import (
    PoseGraphProblem, pose_graph_solve, sim3_to_se3,
)
from ucoslam_tpu.parallel import make_mesh
from ucoslam_tpu.parallel.sharded_posegraph import (
    shard_pose_graph_problem, sharded_pose_graph_solve,
)

RNG = np.random.default_rng(17)


def _loop_problem(K=12, drift=0.05):
    """Circular trajectory with odometry drift + one loop edge."""
    true, noisy = [], []
    for k in range(K):
        a = 2 * np.pi * k / K
        xi = np.array([2 * np.sin(a), 0.0, 2 - 2 * np.cos(a), 0.0, a, 0.0], np.float32)
        T = np.asarray(se3_exp(jnp.asarray(xi)))
        true.append(T)
        d = np.asarray(se3_exp(jnp.asarray(
            (RNG.normal(0, drift * k / K, 6)).astype(np.float32))))
        noisy.append(d @ T)
    true = np.stack(true); noisy = np.stack(noisy)
    ei, ej, meas, w = [], [], [], []
    for k in range(K - 1):  # odometry edges measured from TRUE poses
        ei.append(k); ej.append(k + 1)
        meas.append(true[k] @ np.linalg.inv(true[k + 1])); w.append(50.0)
    ei.append(K - 1); ej.append(0)  # loop edge
    meas.append(true[K - 1] @ np.linalg.inv(true[0])); w.append(200.0)
    fixed = np.zeros(K, bool); fixed[0] = True
    prob = PoseGraphProblem(
        poses=jnp.asarray(noisy), fixed=jnp.asarray(fixed),
        edge_i=jnp.asarray(ei, jnp.int32), edge_j=jnp.asarray(ej, jnp.int32),
        edge_meas=jnp.asarray(np.stack(meas)),
        edge_weight=jnp.asarray(w, jnp.float32),
        edge_valid=jnp.ones(len(w), bool),
    )
    return prob, true


def test_sharded_matches_single_device():
    prob, true = _loop_problem()
    single = np.asarray(pose_graph_solve(prob, iters=15))
    mesh = make_mesh(8)
    sharded_prob = shard_pose_graph_problem(prob, 8)
    multi = np.asarray(sharded_pose_graph_solve(sharded_prob, mesh, iters=15))
    np.testing.assert_allclose(multi, single, atol=1e-4)
    # and it actually solved the graph: poses near truth after normalization
    se3 = np.asarray(sim3_to_se3(jnp.asarray(multi)))
    err = np.linalg.norm(se3[:, :3, 3] - true[:, :3, 3], axis=1)
    assert err.max() < 0.05, err.max()


def test_sharded_fix_scale():
    prob, true = _loop_problem()
    mesh = make_mesh(8)
    sharded_prob = shard_pose_graph_problem(prob, 8)
    multi = np.asarray(
        sharded_pose_graph_solve(sharded_prob, mesh, iters=10, fix_scale=True)
    )
    # scale stays 1 for every keyframe (det of rotation block = s^3)
    dets = np.linalg.det(multi[:, :3, :3])
    np.testing.assert_allclose(dets, 1.0, atol=1e-4)
