"""Distributed BA over the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ucoslam_tpu.parallel import make_mesh, shard_ba_problem, sharded_ba_solve
from ucoslam_tpu.optim.ba import ba_solve

from test_ba import CAM, centers, make_problem


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(8)


def test_sharded_matches_single_device(mesh):
    from ucoslam_tpu.geometry import ate_rmse

    problem, poses_true, X = make_problem(n_kf=6, n_pt=160, noise_px=0.3)
    sharded = shard_ba_problem(problem, 8)
    cam_pose, pt_pos, costs = sharded_ba_solve(sharded, CAM, mesh, iters=12)
    assert costs[-1] < costs[0]
    ate = ate_rmse(centers(np.asarray(cam_pose)), centers(poses_true))
    assert ate < 3e-3, f"sharded BA aligned ATE {ate}"
    # agreement with the single-device solver
    res = ba_solve(problem, CAM, iters=12, stages=1)
    ate_ref = ate_rmse(centers(np.asarray(res.cam_pose)), centers(np.asarray(cam_pose)))
    assert ate_ref < 2e-3, f"sharded vs single disagreement {ate_ref}"


def test_shard_problem_preserves_observations(mesh):
    problem, _, _ = make_problem(n_kf=4, n_pt=100)
    sharded = shard_ba_problem(problem, 8)
    assert int(sharded.obs_valid.sum()) == int(problem.obs_valid.sum())
    # every valid obs points at a point in its own shard
    n = 8
    o_per = sharded.obs_cam.shape[0] // n
    p_per = sharded.pt_pos.shape[0] // n
    obs_shard = np.arange(sharded.obs_cam.shape[0]) // o_per
    pt_shard = np.asarray(sharded.obs_pt) // p_per
    v = np.asarray(sharded.obs_valid)
    assert (obs_shard[v] == pt_shard[v]).all()
