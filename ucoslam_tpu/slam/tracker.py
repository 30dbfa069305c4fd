"""Per-frame tracking: projection matching + robust pose refinement.

Counterpart of the tracking half of the reference System (system.cpp, per
SURVEY.md §3.2): pose prior from the motion model, map-point projection
matching (Map::matchFrameToMapPoints anchor system.cpp:5339), motion-only
LM refine (PnPSolver::solvePnp :5381), and BoW/brute-force relocalization
when lost (:4923-5292).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.mapping.frame import Frame
from ucoslam_tpu.mapping.map import Map, MapState
from ucoslam_tpu.matching.projection import match_points_to_frame
from ucoslam_tpu.ops.hamming import (
    INVALID_DIST,
    filter_ambiguous_train_sized,
    hamming_matrix,
    match_best2,
)
from ucoslam_tpu.optim.pnp import motion_only_lm, pnp_ransac


class TrackResult(NamedTuple):
    ok: bool
    pose_f2g: jnp.ndarray
    frame: Frame  # with ids assigned for inlier matches
    n_matches: int
    n_inliers: int
    matched_point_slots: np.ndarray  # (n,) int32 slots of inlier points
    vis_mask: jnp.ndarray | None = None  # (P,) bool — points searched this frame
    seen_mask: jnp.ndarray | None = None  # (P,) bool — points matched inlier


@jax.jit
def _track_step(
    state: MapState,
    frame: Frame,
    cam: CameraParams,
    prior: jnp.ndarray,
    proj_dist_thr: jnp.ndarray,
    max_desc_dist: jnp.ndarray,
    scale_factor: jnp.ndarray,
):
    """Jitted core: match active map points against the frame and refine."""
    m = match_points_to_frame(
        state.pt_pos,
        state.pt_desc,
        state.pt_normal,
        state.pt_min_dist,
        state.pt_max_dist,
        state.pt_active,
        frame,
        cam,
        prior,
        proj_dist_thr,
        max_desc_dist,
        scale_factor,
    )
    # Compact to KEYPOINT-major before the LM: the map has P >> N slots and
    # only matched keypoints carry observations, so iterating the LM over
    # (N,) rows instead of (P,) cuts the per-iteration sweep ~8x.
    P = state.pt_pos.shape[0]
    pt_slots = jnp.arange(P, dtype=jnp.int32)
    safe_k = jnp.where(m.point_valid, m.kpt_idx, frame.n)
    pt_of_kpt = jnp.full((frame.n,), -1, jnp.int32).at[safe_k].set(
        pt_slots, mode="drop"
    )
    obs_valid = pt_of_kpt >= 0
    X = state.pt_pos[jnp.clip(pt_of_kpt, 0)]
    sigma2 = jnp.exp(
        2.0 * frame.octave.astype(jnp.float32) * jnp.log(scale_factor)
    )
    res = motion_only_lm(
        prior, X, frame.und_xy, sigma2, obs_valid, cam, iters=10, rounds=4
    )
    inlier_kpt = res.inliers & obs_valid  # (N,)
    ids = jnp.where(inlier_kpt, pt_of_kpt, -1)
    # map inliers back to point slots for the seen-counter mask
    safe_p = jnp.where(inlier_kpt, pt_of_kpt, P)
    inlier = jnp.zeros((P,), bool).at[safe_p].set(True, mode="drop")
    # seen/visible masks (MapPoint statistics, mappoint.h:73-74); returned as
    # masks so the single map-writer (System in sequential mode, the mapping
    # worker in async mode) applies the increments — the tracker never
    # mutates the shared map
    return (
        res.pose_f2g,
        ids,
        inlier,
        m.n_matched,
        res.n_inliers,
        m.point_valid,
        inlier,
    )


@jax.jit
def _reloc_match(state: MapState, frame: Frame, max_desc_dist: jnp.ndarray):
    """Brute-force 3D-2D candidate matches for relocalization."""
    d = hamming_matrix(state.pt_desc, frame.desc)  # (P, N)
    idx, best, second = match_best2(
        d,
        valid_rows=state.pt_active,
        valid_cols=frame.valid,
    )
    accept = (best <= max_desc_dist) & (
        best.astype(jnp.float32) < 0.75 * second.astype(jnp.float32)
    )
    keep = filter_ambiguous_train_sized(
        idx, jnp.where(accept, best, INVALID_DIST), frame.n
    )
    return jnp.where(accept & keep, idx, -1), accept & keep


class Tracker:
    def __init__(self, params: Params, cam: CameraParams):
        self.params = params
        self.cam = cam
        self._key = jax.random.PRNGKey(0xC0FFEE)

    def track(self, world_map: Map, frame: Frame, prior: jnp.ndarray) -> TrackResult:
        st = world_map.state
        p = self.params
        pose, ids, inlier, n_matched, n_inliers, vis, seen = _track_step(
            st,
            frame,
            self.cam,
            prior,
            jnp.float32(p.projDistThr),
            jnp.float32(p.maxDescDistance),
            jnp.float32(p.scaleFactor),
        )
        n_inl = int(n_inliers)
        if n_inl < 15:
            # One retry with a widened search radius (the reference widens
            # projDistThr when tracking weakens).
            pose, ids, inlier, n_matched, n_inliers, vis, seen = _track_step(
                st,
                frame,
                self.cam,
                prior,
                jnp.float32(p.projDistThr * 2.5),
                jnp.float32(p.maxDescDistance),
                jnp.float32(p.scaleFactor),
            )
            n_inl = int(n_inliers)
        ok = n_inl >= 15
        slots = np.nonzero(np.asarray(inlier))[0].astype(np.int32)
        return TrackResult(
            ok=ok,
            pose_f2g=pose,
            frame=frame._replace(ids=ids, pose_f2g=pose),
            n_matches=int(n_matched),
            n_inliers=n_inl,
            matched_point_slots=slots,
            vis_mask=vis if ok else None,
            seen_mask=seen if ok else None,
        )

    def relocalize(
        self, world_map: Map, frame: Frame, kfdb=None
    ) -> TrackResult:
        """Relocalize a lost tracker.

        With a keyframe database (`kfdb`), this is the reference's BoW
        path (system.cpp:4923-5292): retrieve covis-grouped candidate
        keyframes (keyframedatabase.cpp:195-304), match the frame against
        each candidate's MAP POINTS and verify with PnP-RANSAC — cost
        O(candidates x N^2), independent of the total map size. Without
        one (DummyDataBase), fall back to brute-force matching against the
        whole point arena.
        """
        if kfdb is not None and not kfdb.dummy:
            from ucoslam_tpu.matching.kfmatch import match_keyframe_points_pnp_batch

            cands = kfdb.relocalization_candidates(
                frame.desc,
                frame.valid,
                world_map.keyframes.active,
                covis=world_map.covis_matrix(),
            )
            self._key, sub = jax.random.split(self._key)
            # all candidates verified in one vmapped dispatch; try the
            # best-supported verified pose first
            cms = match_keyframe_points_pnp_batch(
                world_map, frame, cands, self.cam, self.params, sub,
                min_matches=20, min_inliers=15,
            )
            for cm in sorted(cms, key=lambda c: -c.n_inliers):
                if cm.ok:
                    res = self.track(world_map, frame, jnp.asarray(cm.pose_f2g))
                    if res.ok:
                        return res
            return TrackResult(
                False, frame.pose_f2g, frame, 0, 0, np.zeros(0, np.int32)
            )
        st = world_map.state
        p = self.params
        kpt_idx, valid = _reloc_match(st, frame, jnp.float32(p.maxDescDistance))
        safe = jnp.where(valid, kpt_idx, 0)
        uv = frame.und_xy[safe]
        sigma2 = jnp.exp(
            2.0
            * frame.octave[safe].astype(jnp.float32)
            * jnp.log(jnp.float32(p.scaleFactor))
        )
        self._key, sub = jax.random.split(self._key)
        res = pnp_ransac(
            st.pt_pos, uv, sigma2, valid, self.cam, sub,
            n_hypotheses=p.ransacIters,
        )
        if int(res.n_inliers) < 20:
            return TrackResult(False, frame.pose_f2g, frame, 0, 0, np.zeros(0, np.int32))
        # refine with projection tracking from the RANSAC pose
        return self.track(world_map, frame, res.pose_f2g)
