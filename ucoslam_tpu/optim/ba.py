"""Schur-complement Levenberg-Marquardt bundle adjustment.

Counterpart of the reference GlobalOptimizerG2O
(globaloptimizer_g2o.{h:31,cpp:77-537}): SE3 keyframe vertices, XYZ point
vertices *marginalized* via the Schur complement (:218), mono 2D edges with
per-octave information 1/sigma^2 and Huber delta = sqrt(5.99) (:230-248),
stereo 3D edges (u, v, u - bf/z) with delta = sqrt(7.815) (:250-272),
outlier demotion between stages (:418-461), bad-association extraction
(:466-537). Points need >= 2 observations (or stereo) to enter (:142).

TPU-native design (vs g2o's sparse CHOLMOD pipeline):
- all residuals/Jacobians for every observation in one batched sweep
  (stereo rows included as a third masked residual row);
- per-point 3x3 Hessians inverted closed-form, vmapped;
- reduced camera system S (6K x 6K) assembled by scanning over the
  per-point compact observation table (P, MO) and scatter-adding 6x6
  interaction blocks — then solved densely on the MXU;
- fixed LM iteration count, jit once per capacity signature.

The same kernel serves local BA (covis window, boundary fixed) and global
BA (all keyframes, first fixed); parallel/sharded_ba distributes the
observation sweep and Schur assembly across a device mesh with psum.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.config import CHI2_2D, CHI2_3D
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.geometry.se3 import _hat, se3_exp
from ucoslam_tpu.mapping.map import Map


class BAProblem(NamedTuple):
    """Fixed-shape BA problem (padded; masks define the live part)."""

    cam_pose: jnp.ndarray  # (K, 4, 4) pose_f2g
    cam_fixed: jnp.ndarray  # (K,) bool — held constant
    cam_valid: jnp.ndarray  # (K,) bool
    pt_pos: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,) bool
    obs_cam: jnp.ndarray  # (O,) int32 index into cam arrays
    obs_pt: jnp.ndarray  # (O,) int32 index into pt arrays
    obs_uv: jnp.ndarray  # (O, 2)
    obs_sigma2: jnp.ndarray  # (O,)
    obs_depth: jnp.ndarray  # (O,) stereo depth measurement (0 = mono)
    obs_valid: jnp.ndarray  # (O,) bool
    pt_obs: jnp.ndarray  # (P, MO) int32 obs index per point (-1 pad)
    bf: jnp.ndarray  # () baseline * fx
    # fixed-landmark observations: marker corners whose world position is
    # held constant this solve (MarkerEdgeOnlyProject-style, typesg2o.h:414;
    # full marker SE3 vertices are a follow-up). Contribute only to the
    # camera blocks — no Schur interaction.
    fobs_cam: jnp.ndarray = None  # (F,) int32
    fobs_xyz: jnp.ndarray = None  # (F, 3) world position (marker corner)
    fobs_uv: jnp.ndarray = None  # (F, 2)
    fobs_weight: jnp.ndarray = None  # (F,) information weight
    fobs_valid: jnp.ndarray = None  # (F,) bool


class BAResult(NamedTuple):
    cam_pose: jnp.ndarray
    pt_pos: jnp.ndarray
    obs_chi2: jnp.ndarray  # (O,) final per-observation chi2
    obs_bad: jnp.ndarray  # (O,) bool — bad association (chi2 / neg depth)
    cost_history: jnp.ndarray  # (iters,)


def _residual_jac(problem: BAProblem, cam_pose, pt_pos, cam: CameraParams):
    """Per-observation 3-row residual and Jacobians.

    Row 0, 1: (u, v) reprojection. Row 2: stereo disparity residual
    u_r = u - bf/z, masked to zero for mono observations.
    Returns r (O, 3), Jc (O, 3, 6), Jp (O, 3, 3), q (O, 3), row_mask (O, 3).
    """
    T = cam_pose[problem.obs_cam]
    X = pt_pos[problem.obs_pt]
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    q = jnp.einsum("oij,oj->oi", R, X) + t
    z = q[:, 2].clip(1e-6)
    inv_z = 1.0 / z
    u_hat = cam.fx * q[:, 0] * inv_z + cam.cx
    v_hat = cam.fy * q[:, 1] * inv_z + cam.cy
    stereo = problem.obs_depth > 0
    ur_obs = problem.obs_uv[:, 0] - problem.bf / problem.obs_depth.clip(1e-6)
    ur_hat = u_hat - problem.bf * inv_z
    r = jnp.stack(
        [
            u_hat - problem.obs_uv[:, 0],
            v_hat - problem.obs_uv[:, 1],
            jnp.where(stereo, ur_hat - ur_obs, 0.0),
        ],
        -1,
    )
    zero = jnp.zeros_like(inv_z)
    # d(u,v,ur)/dq
    du_dq = jnp.stack([cam.fx * inv_z, zero, -cam.fx * q[:, 0] * inv_z**2], -1)
    dv_dq = jnp.stack([zero, cam.fy * inv_z, -cam.fy * q[:, 1] * inv_z**2], -1)
    dur_dq = du_dq + jnp.stack([zero, zero, problem.bf * inv_z**2], -1)
    J_proj = jnp.stack([du_dq, dv_dq, dur_dq], -2)  # (O, 3, 3)
    J_pose = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), q.shape[:1] + (3, 3)), -_hat(q)], -1
    )  # (O, 3, 6)
    Jc = J_proj @ J_pose
    Jp = J_proj @ R
    row_mask = jnp.stack(
        [jnp.ones_like(stereo), jnp.ones_like(stereo), stereo], -1
    ).astype(jnp.float32)
    return r, Jc, Jp, q, row_mask


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Batched closed-form 3x3 inverse."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = (a * A + b * B + c * C)[..., None, None]
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e], -1),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)], -1),
            jnp.stack([C, -(a * h - b * g), a * e - b * d], -1),
        ],
        -2,
    )
    return adj / jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)


def _chi2_of(problem: BAProblem, cam_pose, pt_pos, cam):
    r, _, _, q, row_mask = _residual_jac(problem, cam_pose, pt_pos, cam)
    return jnp.sum(r * r * row_mask, -1) / problem.obs_sigma2.clip(1e-9), q


def _fobs_residual_jac(problem: BAProblem, cam_pose, cam: CameraParams):
    """Fixed-landmark (marker corner) residual (F, 2) and Jc (F, 2, 6)."""
    T = cam_pose[problem.fobs_cam]
    X = problem.fobs_xyz
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    q = jnp.einsum("oij,oj->oi", R, X) + t
    z = q[:, 2].clip(1e-6)
    inv_z = 1.0 / z
    uv_hat = jnp.stack(
        [cam.fx * q[:, 0] * inv_z + cam.cx, cam.fy * q[:, 1] * inv_z + cam.cy], -1
    )
    r = uv_hat - problem.fobs_uv
    zero = jnp.zeros_like(inv_z)
    J_proj = jnp.stack(
        [
            jnp.stack([cam.fx * inv_z, zero, -cam.fx * q[:, 0] * inv_z**2], -1),
            jnp.stack([zero, cam.fy * inv_z, -cam.fy * q[:, 1] * inv_z**2], -1),
        ],
        -2,
    )
    J_pose = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(3), q.shape[:1] + (3, 3)), -_hat(q)], -1
    )
    return r, J_proj @ J_pose, q


def _robust_cost(problem: BAProblem, cam_pose, pt_pos, cam):
    c2, _ = _chi2_of(problem, cam_pose, pt_pos, cam)
    delta2 = jnp.where(problem.obs_depth > 0, CHI2_3D, CHI2_2D)
    rho = jnp.where(c2 <= delta2, c2, 2.0 * jnp.sqrt(delta2 * c2.clip(1e-12)) - delta2)
    cost = jnp.sum(jnp.where(problem.obs_valid, rho, 0.0))
    if problem.fobs_cam is not None:
        r, _, _ = _fobs_residual_jac(problem, cam_pose, cam)
        c2f = jnp.sum(r * r, -1) * problem.fobs_weight
        from ucoslam_tpu.config import CHI2_8D

        d8 = CHI2_8D / 4.0  # per-corner share of the 8-dof threshold
        rhof = jnp.where(
            c2f <= d8, c2f, 2.0 * jnp.sqrt(d8 * c2f.clip(1e-12)) - d8
        )
        cost = cost + jnp.sum(jnp.where(problem.fobs_valid, rhof, 0.0))
    return cost


@partial(jax.jit, static_argnames=("iters", "stages"))
def ba_solve(
    problem: BAProblem,
    cam: CameraParams,
    iters: int = 20,
    stages: int = 2,
) -> BAResult:
    """LM with point marginalization.

    `stages` rounds of `iters` fixed LM steps; between rounds observations
    with chi2 above their threshold are demoted to weight zero (the
    reference's two-stage outlier-demotion, globaloptimizer_g2o.cpp:418-461).
    """
    K = problem.cam_pose.shape[0]
    P = problem.pt_pos.shape[0]
    MO = problem.pt_obs.shape[1]
    O = problem.obs_cam.shape[0]
    free_cam = problem.cam_valid & ~problem.cam_fixed

    def lm_step_with(w_info, obs_active, carry, _):
        cam_pose, pt_pos, lam, cost_prev = carry
        r, Jc, Jp, q, row_mask = _residual_jac(problem, cam_pose, pt_pos, cam)
        c2 = jnp.sum(r * r * row_mask, -1) / problem.obs_sigma2.clip(1e-9)
        delta2 = jnp.where(problem.obs_depth > 0, CHI2_3D, CHI2_2D)
        w = w_info * jnp.minimum(1.0, jnp.sqrt(delta2 / c2.clip(1e-12)))
        Jc = Jc * row_mask[:, :, None]
        Jp = Jp * row_mask[:, :, None]

        # normal-equation blocks
        Hcc = jnp.zeros((K, 6, 6)).at[problem.obs_cam].add(
            jnp.einsum("oij,oik,o->ojk", Jc, Jc, w)
        )
        bc = jnp.zeros((K, 6)).at[problem.obs_cam].add(
            jnp.einsum("oij,oi,o->oj", Jc, r, w)
        )
        if problem.fobs_cam is not None:
            rf, Jf, _ = _fobs_residual_jac(problem, cam_pose, cam)
            from ucoslam_tpu.config import CHI2_8D

            c2f = jnp.sum(rf * rf, -1) * problem.fobs_weight
            wf = (
                problem.fobs_valid.astype(jnp.float32)
                * problem.fobs_weight
                * jnp.minimum(1.0, jnp.sqrt((CHI2_8D / 4.0) / c2f.clip(1e-12)))
            )
            Hcc = Hcc.at[problem.fobs_cam].add(jnp.einsum("oij,oik,o->ojk", Jf, Jf, wf))
            bc = bc.at[problem.fobs_cam].add(jnp.einsum("oij,oi,o->oj", Jf, rf, wf))
        Hpp = jnp.zeros((P, 3, 3)).at[problem.obs_pt].add(
            jnp.einsum("oij,oik,o->ojk", Jp, Jp, w)
        )
        bp = jnp.zeros((P, 3)).at[problem.obs_pt].add(
            jnp.einsum("oij,oi,o->oj", Jp, r, w)
        )
        A = jnp.einsum("oij,oik,o->ojk", Jc, Jp, w)  # (O, 6, 3)

        # damping
        lamI6 = lam * jnp.eye(6)
        lamI3 = lam * jnp.eye(3)
        Hpp_d = Hpp + lamI3 * jnp.maximum(
            jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1.0
        )
        Hpp_inv = _inv3x3(Hpp_d)
        Hpp_inv = jnp.where(problem.pt_valid[:, None, None], Hpp_inv, 0.0)

        # --- Schur assembly over the per-point obs table ---------------
        # pad A/cam with a zero row for -1 entries
        A_pad = jnp.concatenate([A, jnp.zeros((1, 6, 3))], 0)
        cam_pad = jnp.concatenate([problem.obs_cam, jnp.array([K], jnp.int32)])
        tbl = jnp.where(problem.pt_obs >= 0, problem.pt_obs, O)  # (P, MO)
        A_list = A_pad[tbl]  # (P, MO, 6, 3)
        cam_list = cam_pad[tbl]  # (P, MO) in [0, K]
        Y_list = jnp.einsum("pmij,pjk->pmik", A_list, Hpp_inv)  # (P, MO, 6, 3)

        S = jnp.zeros((K + 1, K + 1, 6, 6))

        def schur_row(S, a):
            Ya = Y_list[:, a]  # (P, 6, 3)
            ca = cam_list[:, a]  # (P,)
            contrib = jnp.einsum("pij,pmkj->pmik", Ya, A_list)  # (P, MO, 6, 6)
            S = S.at[ca[:, None], cam_list].add(-contrib)
            return S, None

        S, _ = jax.lax.scan(schur_row, S, jnp.arange(MO))
        S = S[:K, :K]
        S = S.at[jnp.arange(K), jnp.arange(K)].add(
            Hcc
            + lamI6
            * jnp.maximum(jnp.trace(Hcc, axis1=-2, axis2=-1)[:, None, None] / 6.0, 1.0)
        )

        # rhs: bc_schur = bc - sum_o Y_o bp[pt(o)]
        Y = A @ Hpp_inv[problem.obs_pt]  # (O, 6, 3)
        bc_schur = bc.at[problem.obs_cam].add(
            -jnp.einsum("oij,oj->oi", Y, bp[problem.obs_pt])
        )

        # fixed / invalid cameras: identity rows, zero rhs
        free = free_cam
        Sf = jnp.where(free[:, None, None, None] & free[None, :, None, None], S, 0.0)
        Sf = Sf.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.where(free, 0.0, 1.0)[:, None, None] * jnp.eye(6)
        )
        b_f = jnp.where(free[:, None], bc_schur, 0.0)

        S_full = Sf.transpose(0, 2, 1, 3).reshape(6 * K, 6 * K)
        delta_c = jnp.linalg.solve(
            S_full + 1e-8 * jnp.eye(6 * K), b_f.reshape(-1)
        ).reshape(K, 6)
        delta_c = jnp.where(free[:, None], delta_c, 0.0)

        # back-substitute points: delta_p = Hpp^-1 (bp - sum_o A_o^T dc[cam_o])
        t_contrib = jnp.zeros((P, 3)).at[problem.obs_pt].add(
            jnp.einsum("oij,oi->oj", A, delta_c[problem.obs_cam])
        )
        delta_p = jnp.einsum("pij,pj->pi", Hpp_inv, bp - t_contrib)
        delta_p = jnp.where(problem.pt_valid[:, None], delta_p, 0.0)

        new_cam = se3_exp(-delta_c) @ cam_pose
        new_cam = jnp.where(free[:, None, None], new_cam, cam_pose)
        new_pt = pt_pos - delta_p

        new_cost = _robust_cost(
            problem._replace(obs_valid=obs_active), new_cam, new_pt, cam
        )
        improved = new_cost < cost_prev
        cam_pose = jnp.where(improved, new_cam, cam_pose)
        pt_pos = jnp.where(improved, new_pt, pt_pos)
        cost = jnp.where(improved, new_cost, cost_prev)
        lam = jnp.where(improved, lam * 0.5, lam * 8.0).clip(1e-7, 1e6)
        return (cam_pose, pt_pos, lam, cost), cost

    cam_pose, pt_pos = problem.cam_pose, problem.pt_pos
    active = problem.obs_valid
    all_costs = []
    for stage in range(stages):
        w_info = active.astype(jnp.float32) / problem.obs_sigma2.clip(1e-9)
        cost0 = _robust_cost(problem._replace(obs_valid=active), cam_pose, pt_pos, cam)
        (cam_pose, pt_pos, _, _), costs = jax.lax.scan(
            partial(lm_step_with, w_info, active),
            (cam_pose, pt_pos, jnp.float32(1e-4), cost0),
            None,
            length=iters,
        )
        all_costs.append(costs)
        if stage < stages - 1:
            c2_s, q_s = _chi2_of(problem, cam_pose, pt_pos, cam)
            delta2_s = jnp.where(problem.obs_depth > 0, CHI2_3D, CHI2_2D)
            active = problem.obs_valid & (c2_s <= delta2_s) & (q_s[:, 2] > 0)
    costs = jnp.concatenate(all_costs)
    c2, q = _chi2_of(problem, cam_pose, pt_pos, cam)
    delta2 = jnp.where(problem.obs_depth > 0, CHI2_3D, CHI2_2D)
    bad = problem.obs_valid & ((c2 > delta2) | (q[:, 2] <= 0))
    return BAResult(
        cam_pose=cam_pose, pt_pos=pt_pos, obs_chi2=c2, obs_bad=bad, cost_history=costs
    )


# ----------------------------------------------------------------------
# Host-side problem construction from a Map
# ----------------------------------------------------------------------


def build_ba_problem(
    world_map: Map,
    cam: CameraParams,
    used_kfs: np.ndarray | None = None,
    fixed_kfs: np.ndarray | None = None,
    fix_first: bool = True,
    max_obs_per_point: int = 16,
    min_obs: int = 2,
) -> tuple[BAProblem, np.ndarray, np.ndarray]:
    """Flatten a Map (or a keyframe window) into a fixed-shape BAProblem.

    used_kfs: keyframe slots to optimize (None = all active).
    fixed_kfs: keyframe slots held fixed (the reference's boundary frames).
    Returns (problem, kf_slots, pt_slots) where the slot arrays map problem
    indices back into the Map arenas.
    """
    st = world_map.state
    kf_active = np.asarray(st.kf_active)
    kf_ids = np.asarray(st.kf_ids)
    kf_depth_all = np.asarray(st.kf_depth)
    if used_kfs is None:
        used_kfs = np.nonzero(kf_active)[0]
    used_kfs = np.asarray(sorted(int(s) for s in used_kfs), np.int32)
    fixed_set = set(int(s) for s in (fixed_kfs if fixed_kfs is not None else []))
    if fix_first and len(used_kfs) and not fixed_set:
        fixed_set = {int(used_kfs[0])}
    all_kfs = np.asarray(
        sorted(set(used_kfs.tolist()) | fixed_set), np.int32
    )
    kf_index = {int(s): i for i, s in enumerate(all_kfs)}

    # observations of points by the window keyframes
    obs_cam, obs_pt_slot, obs_kpt = [], [], []
    for s in all_kfs:
        ids = kf_ids[s]
        sel = np.nonzero(ids >= 0)[0]
        obs_cam.append(np.full(len(sel), kf_index[int(s)], np.int32))
        obs_pt_slot.append(ids[sel])
        obs_kpt.append(sel)
    obs_cam = np.concatenate(obs_cam) if obs_cam else np.zeros(0, np.int32)
    obs_pt_slot = np.concatenate(obs_pt_slot) if obs_pt_slot else np.zeros(0, np.int32)
    obs_kpt = np.concatenate(obs_kpt) if obs_kpt else np.zeros(0, np.int32)

    # points: those observed >= min_obs times within the window (or stereo)
    depth_per_obs = kf_depth_all[all_kfs[obs_cam], obs_kpt]
    uniq, counts = np.unique(obs_pt_slot, return_counts=True)
    pt_count = dict(zip(uniq.tolist(), counts.tolist()))
    stereo_pts = set(obs_pt_slot[depth_per_obs > 0].tolist())
    pt_slots = np.asarray(
        [p for p in uniq if pt_count[p] >= min_obs or p in stereo_pts], np.int32
    )
    pt_index = np.full(world_map.params.maxMapPoints, -1, np.int32)
    pt_index[pt_slots] = np.arange(len(pt_slots))

    keep = pt_index[obs_pt_slot] >= 0
    obs_cam = obs_cam[keep]
    obs_kpt = obs_kpt[keep]
    obs_pt = pt_index[obs_pt_slot[keep]]

    # cap obs per point to max_obs_per_point (keep earliest keyframes)
    order = np.lexsort((obs_cam, obs_pt))
    obs_cam, obs_pt, obs_kpt = obs_cam[order], obs_pt[order], obs_kpt[order]
    rank = np.zeros(len(obs_pt), np.int32)
    if len(obs_pt):
        same = np.concatenate([[False], obs_pt[1:] == obs_pt[:-1]])
        run = 0
        for i in range(len(obs_pt)):  # small host loop over obs; fine at kf rate
            run = run + 1 if same[i] else 0
            rank[i] = run
    keep = rank < max_obs_per_point
    obs_cam, obs_pt, obs_kpt = obs_cam[keep], obs_pt[keep], obs_kpt[keep]

    O = len(obs_cam)
    kf_xy = np.asarray(st.kf_xy)
    kf_oct = np.asarray(st.kf_octave)
    sf = world_map.params.scaleFactor
    obs_uv = kf_xy[all_kfs[obs_cam], obs_kpt]
    obs_sigma2 = sf ** (2.0 * kf_oct[all_kfs[obs_cam], obs_kpt])
    obs_depth = kf_depth_all[all_kfs[obs_cam], obs_kpt]

    # per-point obs table
    MO = max_obs_per_point
    pt_obs = np.full((len(pt_slots), MO), -1, np.int32)
    slot_fill = np.zeros(len(pt_slots), np.int32)
    for i in range(O):
        p = obs_pt[i]
        pt_obs[p, slot_fill[p]] = i
        slot_fill[p] += 1

    # ---- shape bucketing: pad K/P/O up to coarse buckets so ba_solve
    # compiles once per bucket instead of once per keyframe window --------
    def bucket(n: int, quantum: int) -> int:
        return max(quantum, -(-n // quantum) * quantum)

    Kb = bucket(len(all_kfs), 8)
    Pb = bucket(len(pt_slots), 512)
    Ob = bucket(max(O, 1), 2048)

    cam_fixed = np.asarray([int(s) in fixed_set for s in all_kfs])
    cam_pose = np.tile(np.eye(4, dtype=np.float32), (Kb, 1, 1))
    cam_pose[: len(all_kfs)] = np.asarray(st.kf_pose)[all_kfs]
    cam_fixed_p = np.ones(Kb, bool)  # padded cameras held fixed
    cam_fixed_p[: len(all_kfs)] = cam_fixed
    cam_valid_p = np.zeros(Kb, bool)
    cam_valid_p[: len(all_kfs)] = True
    pt_pos_p = np.zeros((Pb, 3), np.float32)
    pt_pos_p[: len(pt_slots)] = np.asarray(st.pt_pos)[pt_slots]
    pt_valid_p = np.zeros(Pb, bool)
    pt_valid_p[: len(pt_slots)] = True

    def pad_obs(x, fill=0):
        out = np.full((Ob,) + x.shape[1:], fill, x.dtype)
        out[:O] = x
        return out

    obs_valid_p = np.zeros(Ob, bool)
    obs_valid_p[:O] = True
    pt_obs_p = np.full((Pb, max_obs_per_point), -1, np.int32)
    pt_obs_p[: len(pt_slots)] = pt_obs

    # ---- marker corner observations (8D edges, globaloptimizer_g2o.cpp
    # :277-352): corners of markers with valid map pose act as fixed world
    # landmarks; information balanced against the keypoint edges by
    # markersOptWeight / minMarkersForMaxWeight -------------------------
    fobs_cam_l, fobs_xyz_l, fobs_uv_l = [], [], []
    params_m = world_map.params
    if params_m.detectMarkers:
        from ucoslam_tpu.markers.ippe import marker_object_points

        mk_pose = np.asarray(st.mk_pose)
        mk_size = np.asarray(st.mk_size)
        mk_pose_valid = np.asarray(st.mk_pose_valid)
        kf_mk_slot = np.asarray(st.kf_mk_slot)
        kf_mk_corners = np.asarray(st.kf_mk_corners)
        seen_markers = set()
        for ci, s in enumerate(all_kfs):
            for j in range(kf_mk_slot.shape[1]):
                slot = int(kf_mk_slot[s, j])
                if slot < 0 or not mk_pose_valid[slot]:
                    continue
                obj = np.asarray(marker_object_points(jnp.float32(mk_size[slot])))
                world = obj @ mk_pose[slot][:3, :3].T + mk_pose[slot][:3, 3]
                for c in range(4):
                    fobs_cam_l.append(ci)
                    fobs_xyz_l.append(world[c])
                    fobs_uv_l.append(kf_mk_corners[s, j, c])
                seen_markers.add(slot)
    F_real = len(fobs_cam_l)
    Fb = bucket(max(F_real, 1), 128)
    fobs_cam = np.zeros(Fb, np.int32)
    fobs_xyz = np.zeros((Fb, 3), np.float32)
    fobs_uv = np.zeros((Fb, 2), np.float32)
    fobs_weight = np.zeros(Fb, np.float32)
    fobs_valid = np.zeros(Fb, bool)
    if F_real:
        frac = params_m.markersOptWeight * min(
            1.0, len(seen_markers) / max(params_m.minMarkersForMaxWeight, 1)
        )
        frac = min(frac, 0.95)
        w_corner = (frac / (1.0 - frac)) * (max(O, 1) / F_real)
        fobs_cam[:F_real] = fobs_cam_l
        fobs_xyz[:F_real] = np.stack(fobs_xyz_l)
        fobs_uv[:F_real] = np.stack(fobs_uv_l)
        fobs_weight[:F_real] = w_corner
        fobs_valid[:F_real] = True

    problem = BAProblem(
        cam_pose=jnp.asarray(cam_pose),
        cam_fixed=jnp.asarray(cam_fixed_p),
        cam_valid=jnp.asarray(cam_valid_p),
        pt_pos=jnp.asarray(pt_pos_p),
        pt_valid=jnp.asarray(pt_valid_p),
        obs_cam=jnp.asarray(pad_obs(obs_cam)),
        obs_pt=jnp.asarray(pad_obs(obs_pt)),
        obs_uv=jnp.asarray(pad_obs(obs_uv.astype(np.float32))),
        obs_sigma2=jnp.asarray(pad_obs(obs_sigma2.astype(np.float32), fill=1)),
        obs_depth=jnp.asarray(pad_obs(obs_depth.astype(np.float32))),
        obs_valid=jnp.asarray(obs_valid_p),
        pt_obs=jnp.asarray(pt_obs_p),
        bf=jnp.float32(cam.bf),
        fobs_cam=jnp.asarray(fobs_cam),
        fobs_xyz=jnp.asarray(fobs_xyz),
        fobs_uv=jnp.asarray(fobs_uv),
        fobs_weight=jnp.asarray(fobs_weight),
        fobs_valid=jnp.asarray(fobs_valid),
    )
    return problem, all_kfs, pt_slots


def apply_ba_result(
    world_map: Map,
    result: BAResult,
    kf_slots: np.ndarray,
    pt_slots: np.ndarray,
    problem: BAProblem,
    remove_bad: bool = True,
) -> int:
    """Write optimized poses/points back into the map; drop bad associations.

    Returns the number of bad associations removed
    (counterpart getBadAssociations + Map::removeBadAssociations).
    """
    st = world_map.state
    st = st._replace(
        kf_pose=st.kf_pose.at[jnp.asarray(kf_slots)].set(
            result.cam_pose[: len(kf_slots)]
        ),
        pt_pos=st.pt_pos.at[jnp.asarray(pt_slots)].set(result.pt_pos[: len(pt_slots)]),
    )
    world_map.state = st
    n_bad = 0
    if remove_bad:
        bad = np.asarray(result.obs_bad)
        if bad.any():
            obs_cam = np.asarray(problem.obs_cam)[bad]
            obs_pt = np.asarray(problem.obs_pt)[bad]
            # clear those observations: find the keypoint indices again
            kf_ids = np.asarray(world_map.state.kf_ids).copy()
            for c, p in zip(obs_cam, obs_pt):
                kf_slot = int(kf_slots[c])
                pt_slot = int(pt_slots[p])
                sel = np.nonzero(kf_ids[kf_slot] == pt_slot)[0]
                kf_ids[kf_slot, sel] = -1
                n_bad += len(sel)
            world_map.state = world_map.state._replace(kf_ids=jnp.asarray(kf_ids))
    return n_bad


def global_bundle_adjustment(
    world_map: Map, cam: CameraParams, n_iters: int = 50, fix_first: bool = True
) -> int:
    """Full-map BA (counterpart UcoSlam::globalOptimization, ucoslam.cpp:47)."""
    if world_map.n_keyframes < 2:
        return 0
    problem, kf_slots, pt_slots = build_ba_problem(world_map, cam, fix_first=fix_first)
    if len(pt_slots) == 0:
        return 0
    result = ba_solve(problem, cam, iters=n_iters)
    return apply_ba_result(world_map, result, kf_slots, pt_slots, problem)


def local_bundle_adjustment(
    world_map: Map, cam: CameraParams, center_kf: int, n_iters: int = 15,
    max_window: int = 8,
) -> int:
    """Covis-window BA around a keyframe (the mapping thread's local BA,
    mapmanager.cpp:10815-11373): neighbours optimized, boundary fixed."""
    covis = world_map.covis_matrix()
    w = covis[center_kf].copy()
    w[center_kf] = 0
    order = np.argsort(-w)
    window = [center_kf] + [int(s) for s in order[: max_window - 1] if w[s] >= 15]
    if len(window) < 2:
        return 0
    # boundary: keyframes sharing points with the window but not in it
    window_set = set(window)
    boundary = [
        int(s)
        for s in np.nonzero(covis[window].sum(0) > 0)[0]
        if int(s) not in window_set
    ]
    problem, kf_slots, pt_slots = build_ba_problem(
        world_map, cam, used_kfs=np.asarray(window), fixed_kfs=np.asarray(boundary, int),
        fix_first=len(boundary) == 0,
    )
    if len(pt_slots) == 0:
        return 0
    result = ba_solve(problem, cam, iters=n_iters)
    return apply_ba_result(world_map, result, kf_slots, pt_slots, problem)
