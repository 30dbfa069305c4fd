"""Loop detection and map correction.

Counterpart of the reference LoopDetector (loopdetector.{h,cpp}, obfuscated;
behavior per SURVEY.md §2/§3.3):

- keypoint loops: BoW candidates from the keyframe database gated against
  covis-neighbour scores (loopdetector.cpp:3908-3934), descriptor matching
  + PnP-RANSAC geometric verification (:4312) -> expected pose;
- marker loops: a re-observed marker with valid pose gives the expected
  pose closed-form (detectLoopFromMarkers :680);
- correctMap (:3024): covisibility/essential-graph edges + Sim3 pose-graph
  relaxation (graphoptsim3.cpp:74; scale fixed for stereo/RGB-D), point
  correction through their reference keyframes, chi2 validation
  (Map::globalReprojChi2, :3081).
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.mapping.frame import Frame
from ucoslam_tpu.mapping.kfdatabase import KeyFrameDataBase
from ucoslam_tpu.mapping.map import Map
from ucoslam_tpu.optim.posegraph import PoseGraphProblem, pose_graph_solve, sim3_to_se3


class LoopClosureInfo(NamedTuple):
    """Counterpart of the reference LoopClosureInfo (loopdetector.h:671)."""

    found: bool
    cur_kf: int
    matched_kf: int
    expected_pose: np.ndarray | None  # corrected pose_f2g of cur_kf
    n_matches: int = 0  # geometric support (verified inliers / marker corners)


class LoopDetector:
    def __init__(self, params: Params, cam: CameraParams, kfdb: KeyFrameDataBase):
        self.params = params
        self.cam = cam
        self.kfdb = kfdb
        self._key = jax.random.PRNGKey(0x100B)

    # ------------------------------------------------------------------
    def detect_from_keypoints(
        self, world_map: Map, kf_slot: int, frame: Frame, min_fseq_gap: int = 10
    ) -> LoopClosureInfo:
        """BoW candidate -> descriptor match -> PnP geometric check."""
        covis = world_map.covis_matrix()
        neighbours = set(np.nonzero(covis[kf_slot] > 0)[0].tolist()) | {kf_slot}
        kf_active = world_map.keyframes.active.copy()
        # exclude recent keyframes (temporal neighbours can alias as loops)
        fseqs = np.asarray(world_map.state.kf_fseq)
        cur_seq = int(fseqs[kf_slot])
        recent = set(
            int(s)
            for s in np.nonzero(kf_active)[0]
            if abs(cur_seq - int(fseqs[s])) < min_fseq_gap
        )
        cands = self.kfdb.relocalization_candidates(
            frame.desc, frame.valid, kf_active, covis=covis,
            exclude=neighbours | recent,
        )
        if not cands:
            return LoopClosureInfo(False, kf_slot, -1, None)
        # geometric verification of all candidates in one vmapped dispatch
        # (loopdetector.cpp:4312; shared with BoW relocalization)
        from ucoslam_tpu.matching.kfmatch import match_keyframe_points_pnp_batch

        self._key, sub = jax.random.split(self._key)
        cms = match_keyframe_points_pnp_batch(
            world_map, frame, cands, self.cam, self.params, sub,
            min_matches=25, min_inliers=20,
        )
        scored = list(zip(cms, cands))
        cm, cand = max(scored, key=lambda t: (t[0].ok, t[0].n_inliers))
        if not cm.ok:
            return LoopClosureInfo(False, kf_slot, -1, None)
        return LoopClosureInfo(True, kf_slot, cand, cm.pose_f2g, cm.n_inliers)

    # ------------------------------------------------------------------
    def detect_from_markers(
        self, world_map: Map, kf_slot: int, frame: Frame, min_gap: int = 15
    ) -> LoopClosureInfo:
        """Re-observation of a marker last seen long ago -> closed-form pose."""
        from ucoslam_tpu.slam.markermap import best_pose_from_valid_markers

        mk = frame.markers
        if not bool(np.asarray(mk.valid).any()):
            return LoopClosureInfo(False, kf_slot, -1, None)
        st = world_map.state
        kf_active = np.asarray(st.kf_active)
        kf_mk_slot = np.asarray(st.kf_mk_slot)
        fseqs = np.asarray(st.kf_fseq)
        cur_seq = int(fseqs[kf_slot])
        mk_ids_map = np.asarray(st.mk_id)
        loop_marker, matched_kf = None, -1
        for i in np.nonzero(np.asarray(mk.valid))[0]:
            mid = int(np.asarray(mk.id)[i])
            slot = np.nonzero((mk_ids_map == mid) & np.asarray(st.mk_pose_valid))[0]
            if not len(slot):
                continue
            observers = [
                int(k)
                for k in np.nonzero(kf_active)[0]
                if (kf_mk_slot[k] == slot[0]).any() and k != kf_slot
            ]
            if not observers:
                continue
            last_seen = max(int(fseqs[k]) for k in observers)
            if cur_seq - last_seen >= min_gap:
                loop_marker = int(slot[0])
                matched_kf = max(observers, key=lambda k: int(fseqs[k]))
        if loop_marker is None:
            return LoopClosureInfo(False, kf_slot, -1, None)
        pose = best_pose_from_valid_markers(world_map, mk, self.cam)
        if pose is None:
            return LoopClosureInfo(False, kf_slot, -1, None)
        # geometric support = 4 corner correspondences per posed marker
        n_corners = 4 * int(np.asarray(mk.valid).sum())
        return LoopClosureInfo(True, kf_slot, matched_kf, pose, n_corners)

    # ------------------------------------------------------------------
    def correct_map(
        self, world_map: Map, info: LoopClosureInfo, fix_scale: bool = False,
        min_covis_weight: int = 15,
    ) -> bool:
        """Sim3 pose-graph relaxation + point correction + chi2 validation."""
        if not info.found:
            return False
        st = world_map.state
        chi_before = world_map.global_reproj_chi2(self.cam)
        kf_slots = world_map.keyframes.active_slots()
        slot_index = {int(s): i for i, s in enumerate(kf_slots)}
        K = len(kf_slots)
        poses = np.asarray(st.kf_pose)[kf_slots]

        edges_i, edges_j, meas, weights = [], [], [], []
        # essential graph: covis max-spanning-tree (Kruskal) + strong covis
        # links (CovisGraph::getEG, covisgraph.cpp:253; consumed by
        # correctMap loopdetector.cpp:3024)
        for a, b, w in world_map.essential_graph(min_weight=min_covis_weight):
            a_i, b_i = slot_index[a], slot_index[b]
            edges_i.append(a_i)
            edges_j.append(b_i)
            meas.append(poses[a_i] @ np.linalg.inv(poses[b_i]))
            # edge weight = covisibility count (graphoptsim3.cpp:116-145);
            # artificial temporal bridges (w == 1, inserted only to keep the
            # graph connected) get the covis floor so they do not dominate
            weights.append(float(min_covis_weight) if w <= 1.0 else float(w))
        # the loop edge: measured relative pose between cur and matched,
        # weighted by its verified geometric support (inlier count) on the
        # same scale as the covis-count weights
        ci = slot_index[info.cur_kf]
        mi = slot_index[info.matched_kf]
        T_cur_corrected = info.expected_pose
        meas_loop = T_cur_corrected @ np.linalg.inv(poses[mi])
        edges_i.append(ci)
        edges_j.append(mi)
        meas.append(meas_loop)
        weights.append(float(max(info.n_matches, min_covis_weight)))

        fixed = np.zeros(K, bool)
        fixed[mi] = True  # old side fixed (graphoptsim3.cpp:105)

        # pad vertices/edges to coarse buckets: one pose_graph_solve compile
        # per bucket rather than per loop event
        Kb = max(8, -(-K // 8) * 8)
        E = len(meas)
        Eb = max(64, -(-E // 64) * 64)
        poses_p = np.tile(np.eye(4, dtype=np.float32), (Kb, 1, 1))
        poses_p[:K] = poses
        fixed_p = np.ones(Kb, bool)
        fixed_p[:K] = fixed
        ei = np.zeros(Eb, np.int32)
        ej = np.zeros(Eb, np.int32)
        meas_p = np.tile(np.eye(4, dtype=np.float32), (Eb, 1, 1))
        w_p = np.zeros(Eb, np.float32)
        ei[:E] = edges_i
        ej[:E] = edges_j
        meas_p[:E] = np.stack(meas)
        w_p[:E] = weights
        problem = PoseGraphProblem(
            poses=jnp.asarray(poses_p),
            fixed=jnp.asarray(fixed_p),
            edge_i=jnp.asarray(ei),
            edge_j=jnp.asarray(ej),
            edge_meas=jnp.asarray(meas_p),
            edge_weight=jnp.asarray(w_p),
            edge_valid=jnp.asarray(np.arange(Eb) < E),
        )
        out = pose_graph_solve(problem, iters=25, fix_scale=fix_scale)
        new_poses = np.asarray(sim3_to_se3(out))[:K]

        # move points with their reference keyframe: X' = Tnew^-1 Told X
        # (vectorized over the whole point arena — no per-keyframe loop)
        kf_ids = np.asarray(st.kf_ids)
        pt_ref_kf = np.full(st.P, -1, np.int32)
        for s in kf_slots[::-1]:  # earliest keyframe wins; O(K x N)
            ids = kf_ids[s]
            obs = ids[ids >= 0]
            pt_ref_kf[obs] = s
        corr_all = np.einsum(
            "kij,kjl->kil", np.linalg.inv(new_poses), poses
        )  # (K, 4, 4) per-keyframe correction
        idx_of_slot = np.full(st.K, 0, np.int32)
        idx_of_slot[kf_slots] = np.arange(len(kf_slots))
        has_ref = pt_ref_kf >= 0
        ref_idx = idx_of_slot[np.clip(pt_ref_kf, 0, None)]
        Rc = corr_all[ref_idx, :3, :3]  # (P, 3, 3)
        tc = corr_all[ref_idx, :3, 3]
        pt_pos = np.asarray(st.pt_pos)
        moved = np.einsum("pij,pj->pi", Rc, pt_pos) + tc
        pt_pos = np.where(has_ref[:, None], moved, pt_pos)
        new_kf_pose = np.asarray(st.kf_pose).copy()
        new_kf_pose[kf_slots] = new_poses

        old_state = world_map.state
        world_map.state = st._replace(
            kf_pose=jnp.asarray(new_kf_pose.astype(np.float32)),
            pt_pos=jnp.asarray(pt_pos.astype(np.float32)),
        )
        chi_after = world_map.global_reproj_chi2(self.cam)
        if not np.isfinite(chi_after) or chi_after > max(chi_before * 3.0, 10.0):
            world_map.state = old_state  # validation failed, roll back
            return False

        # ---- loop-side point fusion (loopdetector.cpp:3024-3081) --------
        # After the Sim3 relaxation the two sides of the seam overlap
        # geometrically; duplicates (same landmark mapped once per side)
        # are merged by projecting into the seam keyframes: the current
        # keyframe, the matched old-side keyframe and its strongest covis
        # neighbours. The caller's post-loop BA then polishes the merged
        # geometry.
        from ucoslam_tpu.slam.mapmanager import fuse_duplicates_into_kf

        covis = world_map.covis_matrix()
        seam = [info.cur_kf, info.matched_kf]
        for anchor in (info.cur_kf, info.matched_kf):
            w = covis[anchor].copy()
            w[anchor] = 0
            nb = np.argsort(-w)[:3]
            seam.extend(int(s) for s in nb if w[s] > 0)
        seen = set()
        for s in seam:
            if s in seen or not world_map.keyframes.active[s]:
                continue
            seen.add(s)
            fuse_duplicates_into_kf(world_map, s, self.cam, self.params)
        return True
