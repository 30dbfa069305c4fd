"""Map bootstrapping from two views, depth, or markers.

Counterpart of the reference MapInitializer (mapinitializer.cpp, obfuscated;
behavior per SURVEY.md §2/§3): keypoint path = match reference<->current
frame, parallel H/F hypotheses, motion recovery, triangulation, scale from
median depth; depth path (stereo/RGB-D) = instant single-frame map from
per-keypoint depth; marker path (ARUCO_initialize :2137) = pose from IPPE
pairs with the aruco_minerrratio_valid ambiguity gate.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.geometry.twoview import estimate_two_view, reconstruct_two_view
from ucoslam_tpu.mapping.frame import Frame
from ucoslam_tpu.mapping.map import FLAG_STEREO, Map
from ucoslam_tpu.matching.matcher import match_frames


def _min_max_dist(dist: np.ndarray, octave: np.ndarray, params: Params):
    """MapPoint scale-invariance bounds from creation distance + octave."""
    sf = params.scaleFactor
    max_d = dist * (sf ** octave)
    min_d = max_d / (sf ** (params.nOctaveLevels - 1))
    return min_d, max_d


def _view_normals(pts_w: np.ndarray, pose_f2g: np.ndarray) -> np.ndarray:
    R, t = pose_f2g[:3, :3], pose_f2g[:3, 3]
    center = -R.T @ t
    rays = pts_w - center
    return (rays / np.linalg.norm(rays, axis=1, keepdims=True).clip(1e-9)).astype(
        np.float32
    )


class MapInitializer:
    """Two-view / depth-based bootstrap writing directly into a Map."""

    def __init__(self, params: Params, cam: CameraParams):
        self.params = params
        self.cam = cam
        self.ref_frame: Frame | None = None
        # fixed seed: the RANSAC draw must not depend on Params — seeding
        # from params.signature() made runSequential (and every other
        # scheduling-irrelevant knob) change WHICH hypotheses are drawn, so
        # async and sequential runs initialized at different frames and
        # their ATE differences were seed luck, not async behavior
        self._key = jax.random.PRNGKey(0x1717)

    def set_reference_frame(self, frame: Frame) -> None:
        self.ref_frame = frame

    # -- depth path (stereo / RGB-D): one frame is enough ---------------
    def initialize_from_depth(self, frame: Frame, world_map: Map) -> bool:
        depth = np.asarray(frame.depth)
        valid = np.asarray(frame.valid) & (depth > 0)
        n = int(valid.sum())
        if n < 100:
            return False
        cam_pts = np.asarray(
            self.cam.unproject(frame.und_xy, frame.depth)
        )  # camera == world for first kf (pose = I)
        idx = np.nonzero(valid)[0]
        octave = np.asarray(frame.octave)[idx]
        dist = np.linalg.norm(cam_pts[idx], axis=1)
        min_d, max_d = _min_max_dist(dist, octave, self.params)
        ids = np.full(frame.n, -1, np.int32)
        slots = world_map.add_points(
            pos=cam_pts[idx],
            normal=_view_normals(cam_pts[idx], np.eye(4, dtype=np.float32)),
            desc=np.asarray(frame.desc)[idx],
            min_dist=min_d,
            max_dist=max_d,
            flags=np.full(len(idx), FLAG_STEREO, np.int32),
            creation_kf=0,
        )
        ids[idx] = slots
        frame = frame._replace(
            ids=jnp.asarray(ids), pose_f2g=jnp.eye(4, dtype=jnp.float32)
        )
        world_map.add_keyframe(frame)
        return True

    # -- marker path (ARUCO_initialize, mapinitializer.cpp:2137) --------
    def initialize_from_markers(self, frame: Frame, world_map: Map):
        """Marker-based bootstrap with real scale.

        One-frame init requires an unambiguous marker
        (err_ratio > aruco_minerrratio_valid and
        aruco_allowOneFrameInitialization); otherwise a two-frame
        cross-view disambiguation against the stored reference frame.
        Returns (ok, cur_frame) with the map seeded on success.
        """
        from ucoslam_tpu.slam.markermap import (
            _reproj_corner_err,
            record_marker_observations,
            resolve_marker_slots,
        )

        p = self.params
        mk = frame.markers
        valid = np.asarray(mk.valid)
        if not valid.any():
            return False, frame
        ratios = np.asarray(mk.err_ratio)
        p1 = np.asarray(mk.pose1)
        und = np.asarray(mk.und_corners)
        ids = np.asarray(mk.id)
        size = p.aruco_markerSize

        # --- one-frame path ---
        if p.aruco_allowOneFrameInitialization:
            good = np.nonzero(valid & (ratios > p.aruco_minerrratio_valid))[0]
            if len(good):
                i = int(good[0])
                cur = frame._replace(pose_f2g=jnp.eye(4, dtype=jnp.float32))
                slots = resolve_marker_slots(world_map, mk)
                st = world_map.state
                world_map.state = st._replace(
                    mk_pose=st.mk_pose.at[slots[i]].set(jnp.asarray(p1[i])),
                    mk_pose_valid=st.mk_pose_valid.at[slots[i]].set(True),
                )
                kf = world_map.add_keyframe(cur)
                record_marker_observations(world_map, kf, mk, slots)
                return True, cur

        # --- two-frame path ---
        if self.ref_frame is None:
            return False, frame
        rmk = self.ref_frame.markers
        rvalid = np.asarray(rmk.valid)
        if not rvalid.any():
            return False, frame
        rids = np.asarray(rmk.id)
        shared = [
            (int(np.nonzero(rids == m)[0][0]), int(np.nonzero(ids == m)[0][0]))
            for m in set(rids[rvalid]) & set(ids[valid])
        ]
        if not shared:
            return False, frame
        rp1, rp2 = np.asarray(rmk.pose1), np.asarray(rmk.pose2)
        cp1, cp2 = np.asarray(mk.pose1), np.asarray(mk.pose2)
        rund = np.asarray(rmk.und_corners)
        ri, ci = shared[0]
        best, best_err = None, np.inf
        for g2m in (rp1[ri], rp2[ri]):  # ref camera is the global frame
            for pose_c in (cp1[ci], cp2[ci]):
                T_cur = pose_c @ np.linalg.inv(g2m)
                err = _reproj_corner_err(
                    g2m, np.eye(4, dtype=np.float32), rund[ri], size, self.cam
                ) + _reproj_corner_err(g2m, T_cur, und[ci], size, self.cam)
                if err < best_err:
                    best, best_err = (g2m, T_cur), err
        if best is None or best_err > 4.0:
            return False, frame
        # require baseline between the two views (or an unambiguous view)
        g2m, T_cur = best
        baseline = float(np.linalg.norm(T_cur[:3, 3] - np.zeros(3)))
        unamb = (ratios[ci] > p.aruco_minerrratio_valid) or (
            np.asarray(rmk.err_ratio)[ri] > p.aruco_minerrratio_valid
        )
        if baseline < p.minBaseLine * 0.5 and not unamb:
            return False, frame

        ref = self.ref_frame._replace(pose_f2g=jnp.eye(4, dtype=jnp.float32))
        cur = frame._replace(pose_f2g=jnp.asarray(T_cur.astype(np.float32)))
        slots_r = resolve_marker_slots(world_map, rmk)
        st = world_map.state
        world_map.state = st._replace(
            mk_pose=st.mk_pose.at[slots_r[ri]].set(jnp.asarray(g2m.astype(np.float32))),
            mk_pose_valid=st.mk_pose_valid.at[slots_r[ri]].set(True),
        )
        kf_r = world_map.add_keyframe(ref)
        record_marker_observations(world_map, kf_r, rmk, slots_r)
        slots_c = resolve_marker_slots(world_map, mk)
        kf_c = world_map.add_keyframe(cur)
        record_marker_observations(world_map, kf_c, mk, slots_c)
        return True, cur

    def marker_metric_scale(self, ref_markers, cur_markers) -> tuple | None:
        """Metric (scale, g2m) from a marker seen in both init frames.

        Used to convert a keypoint two-view init (precise geometry,
        arbitrary scale) to real scale: the marker's IPPE poses give the
        metric baseline between the two views. Returns (metric_baseline,
        ref_marker_index, g2m) or None.
        """
        from ucoslam_tpu.slam.markermap import _reproj_corner_err

        p = self.params
        rvalid = np.asarray(ref_markers.valid)
        cvalid = np.asarray(cur_markers.valid)
        if not (rvalid.any() and cvalid.any()):
            return None
        rids = np.asarray(ref_markers.id)
        cids = np.asarray(cur_markers.id)
        shared = [
            (int(np.nonzero(rids == m)[0][0]), int(np.nonzero(cids == m)[0][0]))
            for m in set(rids[rvalid]) & set(cids[cvalid])
        ]
        if not shared:
            return None
        ri, ci = shared[0]
        rp = (np.asarray(ref_markers.pose1)[ri], np.asarray(ref_markers.pose2)[ri])
        cp = (np.asarray(cur_markers.pose1)[ci], np.asarray(cur_markers.pose2)[ci])
        rund = np.asarray(ref_markers.und_corners)[ri]
        cund = np.asarray(cur_markers.und_corners)[ci]
        size = p.aruco_markerSize
        best, best_err = None, np.inf
        for g2m in rp:
            for pose_c in cp:
                T_cur = pose_c @ np.linalg.inv(g2m)
                err = _reproj_corner_err(
                    g2m, np.eye(4, dtype=np.float32), rund, size, self.cam
                ) + _reproj_corner_err(g2m, T_cur, cund, size, self.cam)
                if err < best_err:
                    best, best_err = (g2m, T_cur), err
        # the gate must admit real-detector corner noise (the native
        # detector lands 1-4 px off on rendered markers); best_err sums
        # TWO per-view RMS errors
        if best is None or best_err > 10.0:
            return None
        g2m, T_cur = best
        return float(np.linalg.norm(T_cur[:3, 3])), ri, g2m.astype(np.float32)

    # -- keypoint two-view path -----------------------------------------
    def _two_view_geometry(self, frame: Frame):
        """Shared two-view core: match vs the stored reference frame, H/F
        RANSAC, motion recovery, triangulation. Returns an error-status
        string or (points_refcam, point_ok, pose_21, matches)."""
        ref = self.ref_frame
        matches = match_frames(
            ref, frame, jnp.float32(self.params.maxDescDistance), nn_ratio=0.9
        )
        if int(matches.n_matches) < 100:
            return "few_matches"
        self._key, sub = jax.random.split(self._key)
        t_idx = matches.train_idx
        uv1 = ref.und_xy
        uv2 = frame.und_xy[jnp.where(t_idx >= 0, t_idx, 0)]
        sigma2 = jnp.exp(
            2.0 * ref.octave.astype(jnp.float32)
            * jnp.log(jnp.float32(self.params.scaleFactor))
        )
        model = estimate_two_view(uv1, uv2, matches.valid, sigma2, sub)
        rec = reconstruct_two_view(
            model, uv1, uv2, matches.valid, sigma2, self.cam, self.cam,
            min_triangulated=jnp.int32(50), min_parallax_deg=jnp.float32(1.0),
        )
        if not bool(rec.ok):
            return "no_geometry"
        return (
            np.asarray(rec.points),
            np.asarray(rec.point_ok),
            np.asarray(rec.pose_21).copy(),
            matches,
        )

    def reseed_two_view(
        self,
        frame: Frame,
        world_map: Map,
        anchor_pose: np.ndarray,
        baseline_hint: float,
        creation_kf: int,
    ):
        """Two-view init of a FRESH MAP SEGMENT inside an existing map.

        Recovery path for unrecoverable tracking loss (the reference's
        harness gives up and waits for relocalization, which a one-way
        trajectory never grants — tests/test_sequence.cpp:268-296): seed a
        new disconnected component anchored at the dead-reckoned global
        pose `anchor_pose` (pose_f2g of the stored reference frame) with
        scale set so the two-view baseline equals `baseline_hint` (metres,
        from the motion model). Later loop closure can stitch the segments
        when the old map is re-observed (BoW loop candidates span the whole
        keyframe database). Returns (status, cur_frame_with_pose,
        (ref_kf_slot, cur_kf_slot) — empty tuple unless status == "ok").
        """
        if self.ref_frame is None:
            return "no_ref", frame, ()
        ref = self.ref_frame
        got = self._two_view_geometry(frame)
        if isinstance(got, str):
            return got, frame, ()
        pts, ok, pose_21, matches = got
        base = float(np.linalg.norm(pose_21[:3, 3]))
        if base < 1e-6:
            return "no_geometry", frame, ()
        # metric-ish scale: make the recovered baseline match the motion
        # model's dead-reckoned baseline (bounded; dead reckoning over the
        # lost gap is approximate)
        s = float(np.clip(baseline_hint / base, 1e-3, 1e3))
        pts = pts * s
        pose_21[:3, 3] *= s

        anchor = np.asarray(anchor_pose, np.float64)
        # global coords: X_g = anchor^-1 @ X_refcam
        A_inv = np.linalg.inv(anchor)
        pts_g = (pts[ok] @ A_inv[:3, :3].T) + A_inv[:3, 3]
        idx1 = np.nonzero(ok)[0]
        idx2 = np.asarray(matches.train_idx)[idx1]
        octave1 = np.asarray(ref.octave)[idx1]
        dist = np.linalg.norm(pts[idx1], axis=1)
        min_d, max_d = _min_max_dist(dist, octave1, self.params)
        slots = world_map.add_points(
            pos=pts_g.astype(np.float32),
            normal=_view_normals(pts_g, anchor.astype(np.float32)),
            desc=np.asarray(ref.desc)[idx1],
            min_dist=min_d,
            max_dist=max_d,
            flags=np.zeros(len(idx1), np.int32),
            creation_kf=creation_kf,
        )
        ids1 = np.full(ref.n, -1, np.int32)
        ids1[idx1] = slots
        ids2 = np.full(frame.n, -1, np.int32)
        ids2[idx2] = slots
        pose_ref = anchor.astype(np.float32)
        pose_cur = (pose_21.astype(np.float64) @ anchor).astype(np.float32)
        ref2 = ref._replace(
            ids=jnp.asarray(ids1), pose_f2g=jnp.asarray(pose_ref)
        )
        cur = frame._replace(
            ids=jnp.asarray(ids2), pose_f2g=jnp.asarray(pose_cur)
        )
        s1 = world_map.add_keyframe(ref2)
        s2 = world_map.add_keyframe(cur)
        return "ok", cur, (s1, s2)

    def initialize_two_view(self, frame: Frame, world_map: Map):
        """Attempt 2-view init vs the stored reference frame.

        Returns (status, cur_frame_with_pose); status is "ok" on success
        ("no_ref" / "few_matches" / "no_geometry" otherwise — the caller
        re-seeds the reference only on few_matches, so low-parallax adjacent
        pairs keep waiting for baseline instead of resetting forever). On
        success the map holds 2 keyframes + triangulated points and the
        world scale is normalized to median scene depth 1 (the reference's
        median-depth normalization).
        """
        if self.ref_frame is None:
            return "no_ref", frame
        ref = self.ref_frame
        # the matcher uses a looser ratio (0.9) than tracking's 0.8: with
        # only two wide-baseline views the second-best is often a true
        # neighbour on the epipolar line, and H/F RANSAC downstream rejects
        # the extra outliers
        got = self._two_view_geometry(frame)
        if isinstance(got, str):
            return got, frame
        pts, ok, pose2, matches = got
        # normalize scale: median depth (in ref camera = world) -> 1
        med = float(np.median(pts[ok][:, 2]))
        if med <= 1e-6:
            return "no_geometry", frame
        scale = 1.0 / med
        pts = pts * scale
        pose2[:3, 3] *= scale

        idx1 = np.nonzero(ok)[0]  # keypoint index in ref frame
        idx2 = np.asarray(matches.train_idx)[idx1]
        octave1 = np.asarray(ref.octave)[idx1]
        dist = np.linalg.norm(pts[idx1], axis=1)
        min_d, max_d = _min_max_dist(dist, octave1, self.params)
        slots = world_map.add_points(
            pos=pts[idx1],
            normal=_view_normals(pts[idx1], np.eye(4, dtype=np.float32)),
            desc=np.asarray(ref.desc)[idx1],
            min_dist=min_d,
            max_dist=max_d,
            flags=np.zeros(len(idx1), np.int32),
            creation_kf=0,
        )
        ids1 = np.full(ref.n, -1, np.int32)
        ids1[idx1] = slots
        ids2 = np.full(frame.n, -1, np.int32)
        ids2[idx2] = slots
        ref2 = ref._replace(ids=jnp.asarray(ids1), pose_f2g=jnp.eye(4, dtype=jnp.float32))
        cur = frame._replace(ids=jnp.asarray(ids2), pose_f2g=jnp.asarray(pose2))
        world_map.add_keyframe(ref2)
        world_map.add_keyframe(cur)
        return "ok", cur
