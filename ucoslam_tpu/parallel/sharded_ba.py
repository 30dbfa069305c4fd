"""Distributed Schur-complement bundle adjustment over a device mesh.

The genuinely new capability vs the reference (which is single-process,
SURVEY.md §2.3): map-point blocks and their observations shard across the
"pt" mesh axis; keyframe poses replicate. Each device:

1. computes residuals/Jacobians for its observation shard,
2. marginalizes its own 3x3 point blocks locally (no communication),
3. assembles its partial reduced camera system S_local (6K x 6K) and rhs,
4. `psum`s S and rhs over ICI — the ONLY collective per iteration,
5. solves the (replicated) dense reduced system redundantly on every
   device — cheaper than sharding a 6K x 6K solve at SLAM-scale K,
6. back-substitutes its own point shard locally.

Observations must be grouped so all observations of a point live on that
point's device — `shard_ba_problem` rounds counts up and pads per shard.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ucoslam_tpu.config import CHI2_2D, CHI2_3D
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.geometry.se3 import se3_exp
from ucoslam_tpu.optim.ba import BAProblem, _inv3x3, _residual_jac


def shard_ba_problem(problem: BAProblem, n_shards: int) -> BAProblem:
    """Regroup a BAProblem so points (and their obs) block-shard evenly.

    Points are already contiguous; observations are re-ordered by point and
    padded so each shard holds the observations of its own point block.
    Padding rows are invalid observations pointing at in-shard indices.
    """
    P_ = problem.pt_pos.shape[0]
    O = problem.obs_cam.shape[0]
    pt_per = -(-P_ // n_shards)
    P_pad = pt_per * n_shards

    obs_pt = np.asarray(problem.obs_pt)
    obs_valid = np.asarray(problem.obs_valid)
    shard_of_pt = np.arange(P_pad) // pt_per
    obs_shard = shard_of_pt[obs_pt]
    # count obs per shard, pad to the max
    per_shard_idx = [np.nonzero(obs_shard == s)[0] for s in range(n_shards)]
    o_per = max(1, max(len(ix) for ix in per_shard_idx))
    order = []
    pad_mask = []
    for s in range(n_shards):
        ix = per_shard_idx[s]
        order.append(ix)
        order.append(np.zeros(o_per - len(ix), np.int64))  # pad rows reuse obs 0
        pad_mask.append(np.ones(len(ix), bool))
        pad_mask.append(np.zeros(o_per - len(ix), bool))
    order = np.concatenate(order)
    pad_mask = np.concatenate(pad_mask)

    def pad_pts(x, fill=0):
        pad = np.full((P_pad - P_,) + x.shape[1:], fill, np.asarray(x).dtype)
        return jnp.asarray(np.concatenate([np.asarray(x), pad]))

    new_obs_pt = obs_pt[order]
    # padded invalid obs must reference a point INSIDE the shard they sit in
    row_shard = np.repeat(np.arange(n_shards), o_per)
    new_obs_pt = np.where(pad_mask, new_obs_pt, row_shard * pt_per)

    # rebuild per-point obs table in the new obs ordering
    MO = problem.pt_obs.shape[1]
    pt_obs = np.full((P_pad, MO), -1, np.int32)
    fill = np.zeros(P_pad, np.int32)
    for i in range(len(order)):
        if not pad_mask[i]:
            continue
        p = new_obs_pt[i]
        if fill[p] < MO:
            pt_obs[p, fill[p]] = i
            fill[p] += 1

    return BAProblem(
        cam_pose=problem.cam_pose,
        cam_fixed=problem.cam_fixed,
        cam_valid=problem.cam_valid,
        pt_pos=pad_pts(problem.pt_pos),
        pt_valid=pad_pts(np.asarray(problem.pt_valid), fill=False),
        obs_cam=jnp.asarray(np.asarray(problem.obs_cam)[order]),
        obs_pt=jnp.asarray(new_obs_pt.astype(np.int32)),
        obs_uv=jnp.asarray(np.asarray(problem.obs_uv)[order]),
        obs_sigma2=jnp.asarray(np.asarray(problem.obs_sigma2)[order]),
        obs_depth=jnp.asarray(np.asarray(problem.obs_depth)[order]),
        obs_valid=jnp.asarray(np.asarray(problem.obs_valid)[order] & pad_mask),
        pt_obs=jnp.asarray(pt_obs),
        bf=problem.bf,
    )


def _shard_step(problem: BAProblem, cam_pose, pt_pos, lam, cam: CameraParams):
    """One Gauss-Newton/LM step, executed inside shard_map.

    All arrays arrive as the LOCAL shard (points + their observations);
    cam_pose is replicated. Returns (new_cam_pose replicated, new local
    pt_pos, local robust cost contribution).
    """
    K = cam_pose.shape[0]
    Pl = pt_pos.shape[0]
    MO = problem.pt_obs.shape[1]
    Ol = problem.obs_cam.shape[0]

    # local obs index space: pt indices are global; convert to local
    shard_id = jax.lax.axis_index("pt")
    pt_base = shard_id * Pl
    local_problem = problem._replace(obs_pt=problem.obs_pt - pt_base)

    r, Jc, Jp, q, row_mask = _residual_jac(local_problem, cam_pose, pt_pos, cam)
    c2 = jnp.sum(r * r * row_mask, -1) / problem.obs_sigma2.clip(1e-9)
    delta2 = jnp.where(problem.obs_depth > 0, CHI2_3D, CHI2_2D)
    w_info = problem.obs_valid.astype(jnp.float32) / problem.obs_sigma2.clip(1e-9)
    w = w_info * jnp.minimum(1.0, jnp.sqrt(delta2 / c2.clip(1e-12)))
    Jc = Jc * row_mask[:, :, None]
    Jp = Jp * row_mask[:, :, None]
    obs_pt_l = local_problem.obs_pt

    Hcc = jnp.zeros((K, 6, 6)).at[problem.obs_cam].add(
        jnp.einsum("oij,oik,o->ojk", Jc, Jc, w)
    )
    bc = jnp.zeros((K, 6)).at[problem.obs_cam].add(jnp.einsum("oij,oi,o->oj", Jc, r, w))
    Hpp = jnp.zeros((Pl, 3, 3)).at[obs_pt_l].add(jnp.einsum("oij,oik,o->ojk", Jp, Jp, w))
    bp = jnp.zeros((Pl, 3)).at[obs_pt_l].add(jnp.einsum("oij,oi,o->oj", Jp, r, w))
    A = jnp.einsum("oij,oik,o->ojk", Jc, Jp, w)

    Hpp_d = Hpp + lam * jnp.eye(3) * jnp.maximum(
        jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1.0
    )
    Hpp_inv = jnp.where(
        jnp.ones((Pl, 1, 1), bool), _inv3x3(Hpp_d), 0.0
    )

    # Schur assembly over the local per-point obs table (local obs indices)
    pt_obs_l = problem.pt_obs  # (Pl, MO) already local obs indices
    A_pad = jnp.concatenate([A, jnp.zeros((1, 6, 3))], 0)
    cam_pad = jnp.concatenate([problem.obs_cam, jnp.array([K], jnp.int32)])
    tbl = jnp.where(pt_obs_l >= 0, pt_obs_l, Ol)
    A_list = A_pad[tbl]
    cam_list = cam_pad[tbl]
    Y_list = jnp.einsum("pmij,pjk->pmik", A_list, Hpp_inv)

    # initial carry must be marked device-varying for the scan under shard_map
    S = jax.lax.pcast(jnp.zeros((K + 1, K + 1, 6, 6)), ("pt",), to="varying")

    def schur_row(S, a):
        contrib = jnp.einsum("pij,pmkj->pmik", Y_list[:, a], A_list)
        return S.at[cam_list[:, a][:, None], cam_list].add(-contrib), None

    S, _ = jax.lax.scan(schur_row, S, jnp.arange(MO))
    S = S[:K, :K]
    S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc)

    Y = A @ Hpp_inv[obs_pt_l]
    bc_schur = bc.at[problem.obs_cam].add(-jnp.einsum("oij,oj->oi", Y, bp[obs_pt_l]))

    # ---- the one collective: reduce S and rhs over the mesh ----
    S = jax.lax.psum(S, "pt")
    bc_schur = jax.lax.psum(bc_schur, "pt")
    Hcc_tot = jax.lax.psum(Hcc, "pt")

    free = problem.cam_valid & ~problem.cam_fixed
    S = S.at[jnp.arange(K), jnp.arange(K)].add(
        lam
        * jnp.eye(6)
        * jnp.maximum(jnp.trace(Hcc_tot, axis1=-2, axis2=-1)[:, None, None] / 6.0, 1.0)
    )
    Sf = jnp.where(free[:, None, None, None] & free[None, :, None, None], S, 0.0)
    Sf = Sf.at[jnp.arange(K), jnp.arange(K)].add(
        jnp.where(free, 0.0, 1.0)[:, None, None] * jnp.eye(6)
    )
    b_f = jnp.where(free[:, None], bc_schur, 0.0)
    S_full = Sf.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
    delta_c = jnp.linalg.solve(S_full + 1e-8 * jnp.eye(6 * K), b_f.reshape(-1)).reshape(
        K, 6
    )
    delta_c = jnp.where(free[:, None], delta_c, 0.0)

    # local back-substitution
    t_contrib = jnp.zeros((Pl, 3)).at[obs_pt_l].add(
        jnp.einsum("oij,oi->oj", A, delta_c[problem.obs_cam])
    )
    delta_p = jnp.einsum("pij,pj->pi", Hpp_inv, bp - t_contrib)

    new_cam = se3_exp(-delta_c) @ cam_pose
    new_cam = jnp.where(free[:, None, None], new_cam, cam_pose)
    new_pt = pt_pos - delta_p

    local_cost = jnp.sum(jnp.where(problem.obs_valid, c2, 0.0))
    total_cost = jax.lax.psum(local_cost, "pt")
    return new_cam, new_pt, total_cost


def sharded_ba_solve(
    problem: BAProblem,
    cam: CameraParams,
    mesh: Mesh,
    iters: int = 10,
    lam: float = 1e-4,
):
    """Run `iters` distributed GN/LM steps of the sharded BA.

    `problem` must come from shard_ba_problem(mesh size). Returns
    (cam_pose, pt_pos, cost_history list).
    """
    n = mesh.devices.size
    sharded = P("pt")
    repl = P()

    obs_specs = BAProblem(
        cam_pose=repl, cam_fixed=repl, cam_valid=repl,
        pt_pos=sharded, pt_valid=sharded,
        obs_cam=sharded, obs_pt=sharded, obs_uv=sharded, obs_sigma2=sharded,
        obs_depth=sharded, obs_valid=sharded, pt_obs=sharded, bf=repl,
    )

    @partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(obs_specs, repl, sharded, repl),
        out_specs=(repl, sharded, repl),
    )
    def step(prob, cam_pose, pt_pos, lam_arr):
        return _shard_step(prob, cam_pose, pt_pos, lam_arr[0], cam)

    # pt_obs entries are global obs indices; convert to per-shard local
    o_per = problem.obs_cam.shape[0] // n
    pt_per = problem.pt_pos.shape[0] // n
    shard_of_pt = jnp.arange(problem.pt_pos.shape[0]) // pt_per
    local_tbl = jnp.where(
        problem.pt_obs >= 0,
        problem.pt_obs - (shard_of_pt * o_per)[:, None],
        -1,
    )
    prob = problem._replace(pt_obs=local_tbl.astype(jnp.int32))

    cam_pose = problem.cam_pose
    pt_pos = problem.pt_pos
    costs = []
    step_j = jax.jit(step)
    for _ in range(iters):
        cam_pose, pt_pos, cost = step_j(prob, cam_pose, pt_pos, jnp.asarray([lam]))
        costs.append(float(cost))
    return cam_pose, pt_pos, costs
