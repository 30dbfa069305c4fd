"""Multi-host plumbing: init fallback, global mesh, primary-IO gate."""

import jax
import numpy as np

from ucoslam_tpu.parallel import global_mesh, init_distributed, is_primary


def test_init_distributed_single_process_fallback():
    """No coordinator configured -> clean single-process fallback."""
    assert init_distributed() is False
    assert jax.process_count() == 1
    assert is_primary()


def test_global_mesh_covers_all_devices():
    mesh = global_mesh()
    assert mesh.devices.size == len(jax.devices())
    assert mesh.axis_names == ("pt",)
    # device order: process-contiguous (ICI-local shards)
    procs = [d.process_index for d in mesh.devices.reshape(-1)]
    assert procs == sorted(procs)


def test_global_mesh_runs_sharded_ba():
    """The production sharded solver accepts the global mesh."""
    from ucoslam_tpu.parallel import shard_ba_problem, sharded_ba_solve

    import sys

    sys.path.insert(0, "tests")
    from test_ba import CAM, make_problem

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    problem, poses_true, _ = make_problem(n_kf=4, n_pt=80, noise_px=0.3)
    mesh = global_mesh()
    sharded = shard_ba_problem(problem, mesh.devices.size)
    res = sharded_ba_solve(sharded, CAM, mesh, iters=8, stages=1)
    costs = np.asarray(res.cost_history)
    assert costs[-1] < costs[0]
