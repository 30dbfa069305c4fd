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
from ucoslam_tpu.optim.pnp import pnp_ransac
from ucoslam_tpu.optim.posegraph import PoseGraphProblem, pose_graph_solve, sim3_to_se3


class LoopClosureInfo(NamedTuple):
    """Counterpart of the reference LoopClosureInfo (loopdetector.h:671)."""

    found: bool
    cur_kf: int
    matched_kf: int
    expected_pose: np.ndarray | None  # corrected pose_f2g of cur_kf


class LoopDetector:
    def __init__(self, params: Params, cam: CameraParams, kfdb: KeyFrameDataBase):
        self.params = params
        self.cam = cam
        self.kfdb = kfdb
        self._key = jax.random.PRNGKey(0x100B)

    # ------------------------------------------------------------------
    def detect_from_keypoints(
        self, world_map: Map, kf_slot: int, frame: Frame, min_covis_gap: int = 3
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
            if abs(cur_seq - int(fseqs[s])) < 10
        )
        cands = self.kfdb.relocalization_candidates(
            frame.desc, frame.valid, kf_active, exclude=neighbours | recent
        )
        for cand in cands:
            info = self._verify_candidate(world_map, kf_slot, frame, cand)
            if info.found:
                return info
        return LoopClosureInfo(False, kf_slot, -1, None)

    def _verify_candidate(
        self, world_map: Map, kf_slot: int, frame: Frame, cand: int
    ) -> LoopClosureInfo:
        """Match the frame against the candidate's MAP POINTS, PnP-RANSAC."""
        st = world_map.state
        ids = np.asarray(st.kf_ids)[cand]
        sel = np.nonzero(ids >= 0)[0]
        if len(sel) < 30:
            return LoopClosureInfo(False, kf_slot, cand, None)
        from ucoslam_tpu.ops.hamming import (
            INVALID_DIST,
            filter_ambiguous_train_sized,
            hamming_matrix,
            match_best2,
        )

        # pad the candidate's point set to the keypoint capacity so the
        # jitted matchers/RANSAC compile once, not once per candidate size
        cap = st.N
        pt_slots = np.zeros(cap, np.int64)
        pt_slots[: len(sel)] = ids[sel][:cap]
        row_valid = jnp.asarray(np.arange(cap) < len(sel))
        pt_desc = st.pt_desc[jnp.asarray(pt_slots)]
        pt_pos = st.pt_pos[jnp.asarray(pt_slots)]
        d = hamming_matrix(pt_desc, frame.desc)
        idx, best, second = match_best2(
            d, valid_rows=row_valid, valid_cols=frame.valid
        )
        accept = (best <= self.params.maxDescDistance) & (
            best.astype(jnp.float32) < 0.75 * second.astype(jnp.float32)
        )
        keep = filter_ambiguous_train_sized(
            idx, jnp.where(accept, best, INVALID_DIST), frame.n
        )
        accept = accept & keep
        if int(jnp.sum(accept)) < 25:
            return LoopClosureInfo(False, kf_slot, cand, None)
        safe = jnp.where(accept, idx, 0)
        uv = frame.und_xy[safe]
        sigma2 = jnp.exp(
            2.0
            * frame.octave[safe].astype(jnp.float32)
            * jnp.log(jnp.float32(self.params.scaleFactor))
        )
        self._key, sub = jax.random.split(self._key)
        res = pnp_ransac(
            pt_pos, uv, sigma2, accept, self.cam, sub,
            n_hypotheses=self.params.ransacIters,
        )
        if int(res.n_inliers) < 20:
            return LoopClosureInfo(False, kf_slot, cand, None)
        return LoopClosureInfo(
            True, kf_slot, cand, np.asarray(res.pose_f2g).astype(np.float32)
        )

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
        return LoopClosureInfo(True, kf_slot, matched_kf, pose)

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
            # temporal bridges (w == 1) carry odometry-grade confidence;
            # covis edges use their shared-observation count as weight
            # (graphoptsim3.cpp:116-145)
            weights.append(100.0 if w <= 1.0 else float(w))
        # the loop edge: measured relative pose between cur and matched
        ci = slot_index[info.cur_kf]
        mi = slot_index[info.matched_kf]
        T_cur_corrected = info.expected_pose
        meas_loop = T_cur_corrected @ np.linalg.inv(poses[mi])
        edges_i.append(ci)
        edges_j.append(mi)
        meas.append(meas_loop)
        weights.append(500.0)

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
        kf_ids = np.asarray(st.kf_ids)
        pt_ref_kf = np.full(st.P, -1, np.int32)
        for s in kf_slots[::-1]:  # earliest keyframe wins
            ids = kf_ids[s]
            obs = ids[ids >= 0]
            pt_ref_kf[obs] = s
        pt_pos = np.asarray(st.pt_pos).copy()
        for i, s in enumerate(kf_slots):
            sel = pt_ref_kf == s
            if not sel.any():
                continue
            T_old = poses[i]
            T_new = new_poses[i]
            corr = np.linalg.inv(T_new) @ T_old
            pt_pos[sel] = pt_pos[sel] @ corr[:3, :3].T + corr[:3, 3]
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
        return True
