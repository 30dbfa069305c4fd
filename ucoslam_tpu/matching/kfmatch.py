"""Frame <-> candidate-keyframe matching with geometric (PnP) verification.

Shared by relocalization (reference system.cpp reloc anchors :4923-5292:
per BoW candidate, match the frame against the candidate keyframe's MAP
POINTS then cv::solvePnPRansac) and by keypoint loop detection
(loopdetector.cpp:4312 runs the same candidate verification).

The candidate's observed point set is padded to the frame keypoint
capacity so the jitted matcher + RANSAC compile once, not per candidate —
and the match cost is O(N_kf x N_frame), independent of the total number
of map points (the reference's BoW-indexed reloc has the same property).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.mapping.frame import Frame
from ucoslam_tpu.mapping.map import Map
from ucoslam_tpu.ops.hamming import (
    INVALID_DIST,
    filter_ambiguous_train_sized,
    hamming_matrix,
    match_best2,
)
from ucoslam_tpu.optim.pnp import pnp_ransac


class CandidateMatch(NamedTuple):
    ok: bool
    pose_f2g: np.ndarray | None  # 4x4 verified pose
    n_matches: int
    n_inliers: int


@jax.jit
def _match_candidate(
    pt_desc: jnp.ndarray,  # (cap, 8) candidate point descriptors (padded)
    row_valid: jnp.ndarray,  # (cap,) bool real rows
    frame_desc: jnp.ndarray,  # (N, 8)
    frame_valid: jnp.ndarray,  # (N,)
    max_desc_dist: jnp.ndarray,
):
    d = hamming_matrix(pt_desc, frame_desc)
    idx, best, second = match_best2(d, valid_rows=row_valid, valid_cols=frame_valid)
    accept = (best <= max_desc_dist) & (
        best.astype(jnp.float32) < 0.75 * second.astype(jnp.float32)
    )
    keep = filter_ambiguous_train_sized(
        idx, jnp.where(accept, best, INVALID_DIST), frame_desc.shape[0]
    )
    accept = accept & keep
    return idx, accept, jnp.sum(accept)


def match_keyframe_points_pnp_batch(
    world_map: Map,
    frame: Frame,
    cands: list[int],
    cam: CameraParams,
    params: Params,
    key: jnp.ndarray,
    min_matches: int = 25,
    min_inliers: int = 20,
    max_cands: int = 5,
) -> list[CandidateMatch]:
    """Verify ALL candidates in one vmapped dispatch (batched counterpart
    of the per-candidate loop; candidate axis padded to `max_cands` so a
    single compilation serves every retrieval size)."""
    if not cands:
        return []
    cands = cands[:max_cands]
    st = world_map.state
    cap = st.N
    C = max_cands
    slots_all = np.zeros((C, cap), np.int64)
    n_sel = np.zeros(C, np.int64)
    for ci, cand in enumerate(cands):
        ids = np.asarray(st.kf_ids)[cand]
        sel = np.nonzero(ids >= 0)[0]
        n_sel[ci] = min(len(sel), cap)
        slots_all[ci, : n_sel[ci]] = ids[sel][:cap]
    row_valid = jnp.asarray(np.arange(cap)[None, :] < n_sel[:, None])
    pt_desc = st.pt_desc[jnp.asarray(slots_all)]  # (C, cap, 8)
    pt_pos = st.pt_pos[jnp.asarray(slots_all)]

    idx, accept, n_acc = jax.vmap(
        _match_candidate, in_axes=(0, 0, None, None, None)
    )(pt_desc, row_valid, frame.desc, frame.valid, jnp.float32(params.maxDescDistance))
    safe = jnp.where(accept, idx, 0)
    uv = frame.und_xy[safe]  # (C, cap, 2)
    sigma2 = jnp.exp(
        2.0
        * frame.octave[safe].astype(jnp.float32)
        * jnp.log(jnp.float32(params.scaleFactor))
    )
    keys = jax.random.split(key, C)
    res = jax.vmap(
        lambda p, u, s, a, k: pnp_ransac(
            p, u, s, a, cam, k, n_hypotheses=params.ransacIters
        )
    )(pt_pos, uv, sigma2, accept, keys)
    out = []
    n_acc = np.asarray(n_acc)
    n_inl = np.asarray(res.n_inliers)
    poses = np.asarray(res.pose_f2g)
    for ci in range(len(cands)):
        ok = int(n_acc[ci]) >= min_matches and int(n_inl[ci]) >= min_inliers
        out.append(
            CandidateMatch(
                ok,
                poses[ci].astype(np.float32) if ok else None,
                int(n_acc[ci]),
                int(n_inl[ci]),
            )
        )
    return out


def match_keyframe_points_pnp(
    world_map: Map,
    frame: Frame,
    cand: int,
    cam: CameraParams,
    params: Params,
    key: jnp.ndarray,
    min_matches: int = 25,
    min_inliers: int = 20,
) -> CandidateMatch:
    """Match `frame` against the map points observed by keyframe `cand`
    and verify geometrically with PnP-RANSAC."""
    st = world_map.state
    ids = np.asarray(st.kf_ids)[cand]
    sel = np.nonzero(ids >= 0)[0]
    if len(sel) < min_matches:
        return CandidateMatch(False, None, 0, 0)
    cap = st.N
    pt_slots = np.zeros(cap, np.int64)
    pt_slots[: len(sel)] = ids[sel][:cap]
    row_valid = jnp.asarray(np.arange(cap) < len(sel))
    pt_desc = st.pt_desc[jnp.asarray(pt_slots)]
    pt_pos = st.pt_pos[jnp.asarray(pt_slots)]

    idx, accept, n_acc = _match_candidate(
        pt_desc, row_valid, frame.desc, frame.valid,
        jnp.float32(params.maxDescDistance),
    )
    if int(n_acc) < min_matches:
        return CandidateMatch(False, None, int(n_acc), 0)
    safe = jnp.where(accept, idx, 0)
    uv = frame.und_xy[safe]
    sigma2 = jnp.exp(
        2.0
        * frame.octave[safe].astype(jnp.float32)
        * jnp.log(jnp.float32(params.scaleFactor))
    )
    res = pnp_ransac(
        pt_pos, uv, sigma2, accept, cam, key, n_hypotheses=params.ransacIters
    )
    n_inl = int(res.n_inliers)
    if n_inl < min_inliers:
        return CandidateMatch(False, None, int(n_acc), n_inl)
    return CandidateMatch(
        True, np.asarray(res.pose_f2g).astype(np.float32), int(n_acc), n_inl
    )
