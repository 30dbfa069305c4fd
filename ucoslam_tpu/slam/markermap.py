"""Marker-map integration: registration, pose disambiguation, marker pose.

Counterparts in the reference:
- ARUCO_bestMarkerPose (MapManager, preserved name; SURVEY.md §2): choose a
  marker's 3D pose from its accumulated observations, resolving the IPPE
  two-solution ambiguity across views (single unambiguous view qualifies
  when err_ratio > aruco_minerrratio_valid, ucoslamtypes.h:144).
- Map::getBestPoseFromValidMarkers (map.cpp:1189): camera pose from
  observed markers with known map pose, with a best/second ambiguity test.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.mapping.frame import Frame, FrameMarkers
from ucoslam_tpu.mapping.map import Map
from ucoslam_tpu.markers.ippe import marker_object_points


def resolve_marker_slots(world_map: Map, markers: FrameMarkers) -> np.ndarray:
    """Map frame marker ids -> map marker slots, allocating new ones.

    Returns (Mf,) int32 slots (-1 where no marker).
    """
    mk_valid = np.asarray(markers.valid)
    mk_ids = np.asarray(markers.id)
    slots = np.full(len(mk_ids), -1, np.int32)
    if not mk_valid.any():
        return slots
    st = world_map.state
    map_ids = np.asarray(st.mk_id)
    for i in np.nonzero(mk_valid)[0]:
        mid = int(mk_ids[i])
        existing = np.nonzero((map_ids == mid) & np.asarray(st.mk_active))[0]
        if len(existing):
            slots[i] = int(existing[0])
        else:
            slot = world_map.markers.alloc()
            st = world_map.state
            world_map.state = st._replace(
                mk_id=st.mk_id.at[slot].set(mid),
                mk_active=st.mk_active.at[slot].set(True),
                mk_size=st.mk_size.at[slot].set(
                    jnp.float32(world_map.params.aruco_markerSize)
                ),
            )
            map_ids = np.asarray(world_map.state.mk_id)
            slots[i] = slot
    return slots


def record_marker_observations(
    world_map: Map, kf_slot: int, markers: FrameMarkers, slots: np.ndarray
) -> None:
    """Store the keyframe's marker observations into the map arrays."""
    st = world_map.state
    world_map.state = st._replace(
        kf_mk_slot=st.kf_mk_slot.at[kf_slot].set(jnp.asarray(slots)),
        kf_mk_corners=st.kf_mk_corners.at[kf_slot].set(markers.und_corners),
    )


def _reproj_corner_err(
    g2m: np.ndarray, kf_pose: np.ndarray, corners: np.ndarray, size: float,
    cam: CameraParams,
) -> float:
    obj = np.asarray(marker_object_points(jnp.float32(size)))
    T = kf_pose @ g2m  # marker -> camera
    pts = obj @ T[:3, :3].T + T[:3, 3]
    if (pts[:, 2] <= 0.01).any():
        return 1e9
    uv = np.asarray(cam.project(jnp.asarray(pts)))
    return float(np.sqrt(np.mean(np.sum((uv - corners) ** 2, -1))))


def update_marker_poses(world_map: Map, cam: CameraParams, params: Params) -> int:
    """Estimate 3D poses for markers that do not have one yet.

    For each observation (kf, marker) both IPPE solutions give a candidate
    g2m = kf_pose^-1 @ pose_k; candidates are scored by corner reprojection
    across ALL observing keyframes; accepted when either one view is
    unambiguous (err_ratio > aruco_minerrratio_valid) or >=
    aruco_minNumFramesRequired views agree. Returns #poses set.
    """
    from ucoslam_tpu.markers.ippe import ippe_square_poses

    st = world_map.state
    mk_active = np.asarray(st.mk_active)
    mk_pose_valid = np.asarray(st.mk_pose_valid)
    pending = np.nonzero(mk_active & ~mk_pose_valid)[0]
    if len(pending) == 0:
        return 0
    kf_active = np.asarray(st.kf_active)
    kf_mk_slot = np.asarray(st.kf_mk_slot)
    kf_mk_corners = np.asarray(st.kf_mk_corners)
    kf_pose = np.asarray(st.kf_pose)
    n_set = 0
    for slot in pending:
        obs = []  # (kf, corners)
        for k in np.nonzero(kf_active)[0]:
            sel = np.nonzero(kf_mk_slot[k] == slot)[0]
            if len(sel):
                obs.append((k, kf_mk_corners[k, sel[0]]))
        if len(obs) == 0:
            continue
        size = float(np.asarray(st.mk_size)[slot])
        # pad the IPPE batch to a fixed width so the vmapped solver
        # compiles once (obs counts vary per marker per call)
        PAD = 16
        obs = obs[:PAD]
        corners_np = np.zeros((PAD, 4, 2), np.float32)
        corners_np[: len(obs)] = np.stack([c for _, c in obs])
        corners_np[len(obs) :] = corners_np[0]
        p1, p2, e1, e2 = ippe_square_poses(
            jnp.asarray(corners_np), jnp.full(PAD, size), cam
        )
        ratios = (np.asarray(e2) / np.clip(np.asarray(e1), 1e-9, None))[: len(obs)]
        unambiguous = ratios > params.aruco_minerrratio_valid
        enough_views = len(obs) >= params.aruco_minNumFramesRequired
        if not (unambiguous.any() or enough_views):
            continue
        # candidates from every (view, solution)
        best, best_err = None, np.inf
        for i, (k, _) in enumerate(obs):
            for pose_k in (np.asarray(p1[i]), np.asarray(p2[i])):
                g2m = np.linalg.inv(kf_pose[k]) @ pose_k
                err = sum(
                    _reproj_corner_err(g2m, kf_pose[kk], cc, size, cam)
                    for kk, cc in obs
                ) / len(obs)
                if err < best_err:
                    best, best_err = g2m, err
        if best is None or best_err > 4.0:  # px, all views must agree
            continue
        if not np.isfinite(best).all():
            continue
        world_map.state = world_map.state._replace(
            mk_pose=world_map.state.mk_pose.at[slot].set(
                jnp.asarray(best.astype(np.float32))
            ),
            mk_pose_valid=world_map.state.mk_pose_valid.at[slot].set(True),
        )
        n_set += 1
    return n_set


import jax


@jax.jit
def _fit_marker_pose_size(kf_poses, corners, view_valid, cam: CameraParams,
                          g2m_init, size_init):
    """Jointly fit a marker's pose AND apparent side length to >= 2 views.

    The fitted size is in MAP units; physical_size / fitted_size is the
    metric scale correction of the whole map (the reference folds this into
    BA via marker edges; here it is a dedicated estimator run at keyframe
    rate). GN on [se3 tangent(6), log_size] with autodiff Jacobians.
    kf_poses/corners are padded to a fixed view count; view_valid masks.
    """
    from ucoslam_tpu.geometry.se3 import se3_exp

    w = view_valid.astype(jnp.float32)[:, None, None]  # (V, 1, 1)

    def residual(theta):
        g2m = se3_exp(theta[:6]) @ g2m_init
        size = jnp.exp(theta[6]) * size_init
        obj = marker_object_points(size)  # (4, 3)
        T = kf_poses @ g2m  # (V, 4, 4)
        pts = jnp.einsum("vij,cj->vci", T[:, :3, :3], obj) + T[:, None, :3, 3]
        uv = cam.project(pts)
        return ((uv - corners) * w).reshape(-1)

    def gn(theta, _):
        r = residual(theta)
        J = jax.jacfwd(residual)(theta)
        H = J.T @ J + 1e-6 * jnp.eye(7)
        return theta - jnp.linalg.solve(H, J.T @ r), None

    theta, _ = jax.lax.scan(gn, jnp.zeros(7), None, length=12)
    g2m = se3_exp(theta[:6]) @ g2m_init
    size = jnp.exp(theta[6]) * size_init
    n = jnp.maximum(view_valid.sum() * 8.0, 1.0)
    rms = jnp.sqrt(jnp.sum(residual(theta) ** 2) / n)
    return g2m, size, rms


def estimate_scale_from_pending_markers(
    world_map: Map, cam: CameraParams, params: Params
) -> float | None:
    """Metric-scale correction for a NOT-yet-metric map from markers that
    have no pose yet.

    For each pending marker with >= 2 well-separated views: take the best
    IPPE candidate (metric units), jointly fit pose + free size to the
    map-scale keyframes, and read physical_size / fitted_size as the map's
    scale correction. Runs ONCE — after the map is rescaled the manager
    locks metric and markers get plain candidate poses. Returns the median
    correction or None.
    """
    from ucoslam_tpu.markers.ippe import ippe_square_poses

    st = world_map.state
    mk_active = np.asarray(st.mk_active)
    mk_pose_valid = np.asarray(st.mk_pose_valid)
    kf_active = np.asarray(st.kf_active)
    kf_mk_slot = np.asarray(st.kf_mk_slot)
    kf_mk_corners = np.asarray(st.kf_mk_corners)
    kf_pose = np.asarray(st.kf_pose)
    ratios = []
    for slot in np.nonzero(mk_active & ~mk_pose_valid)[0]:
        obs = []
        for k in np.nonzero(kf_active)[0]:
            sel = np.nonzero(kf_mk_slot[k] == slot)[0]
            if len(sel):
                obs.append((k, kf_mk_corners[k, sel[0]]))
        if len(obs) < 2:
            continue
        # size/depth are indistinguishable without baseline
        centers = np.stack(
            [-kf_pose[k][:3, :3].T @ kf_pose[k][:3, 3] for k, _ in obs]
        )
        spread = np.linalg.norm(centers - centers.mean(0), axis=1).max()
        size = float(np.asarray(st.mk_size)[slot])
        PAD = 8
        obs = obs[:PAD]
        # best IPPE candidate across views/solutions (metric units)
        corners_np = np.stack([c for _, c in obs])
        p1, p2, e1, e2 = ippe_square_poses(
            jnp.asarray(np.concatenate([corners_np,
                np.repeat(corners_np[:1], PAD - len(obs), 0)])),
            jnp.full(PAD, size), cam,
        )
        best, best_self = None, np.inf
        for i, (k, _) in enumerate(obs):
            for pose_k in (np.asarray(p1[i]), np.asarray(p2[i])):
                g2m = np.linalg.inv(kf_pose[k]) @ pose_k
                err = _reproj_corner_err(g2m, kf_pose[k], obs[i][1], size, cam)
                if err < best_self:
                    best, best_self = g2m, err
        if best is None or not np.isfinite(best).all():
            continue
        vposes = np.tile(np.eye(4, dtype=np.float32), (PAD, 1, 1))
        vcorners = np.zeros((PAD, 4, 2), np.float32)
        for i, (k, c) in enumerate(obs):
            vposes[i] = kf_pose[k]
            vcorners[i] = c
        vvalid = jnp.asarray(np.arange(PAD) < len(obs))
        g2m_f, size_f, rms = _fit_marker_pose_size(
            jnp.asarray(vposes), jnp.asarray(vcorners), vvalid, cam,
            jnp.asarray(best.astype(np.float32)), jnp.float32(size),
        )
        if float(rms) > 3.0 or float(size_f) <= 1e-6:
            continue
        g2m_np = np.asarray(g2m_f)
        if not np.isfinite(g2m_np).all():
            continue
        # baseline-sufficiency gate in consistent MAP units: the keyframe
        # centers and the jointly-fitted marker position g2m_f are both in
        # map scale, so spread / distance is a true parallax ratio (the
        # earlier pre-fit gate mixed the metric IPPE translation with
        # map-unit spread and broke on far-from-metric maps)
        mk_dist = float(np.linalg.norm(centers.mean(0) - g2m_np[:3, 3]))
        if spread < 0.03 * max(mk_dist, 1e-6):
            continue
        ratios.append(size / float(size_f))
    if not ratios:
        return None
    return float(np.median(ratios))


def best_pose_from_valid_markers(
    world_map: Map,
    markers: FrameMarkers,
    cam: CameraParams,
    min_err_ratio: float = 1.5,
) -> np.ndarray | None:
    """Camera pose from observed markers whose map pose is known
    (Map::getBestPoseFromValidMarkers, map.cpp:1189).

    Every (marker, IPPE solution) yields a candidate pose; candidates are
    scored by total corner reprojection over all observed valid markers and
    the winner must beat the runner-up from a DIFFERENT candidate pose by
    the ambiguity ratio test.
    """
    st = world_map.state
    mk_ids = np.asarray(st.mk_id)
    mk_pose = np.asarray(st.mk_pose)
    mk_pose_valid = np.asarray(st.mk_pose_valid)
    mk_size = np.asarray(st.mk_size)

    obs_idx = []
    f_valid = np.asarray(markers.valid)
    f_ids = np.asarray(markers.id)
    for i in np.nonzero(f_valid)[0]:
        sel = np.nonzero((mk_ids == f_ids[i]) & mk_pose_valid)[0]
        if len(sel):
            obs_idx.append((i, int(sel[0])))
    if not obs_idx:
        return None
    p1 = np.asarray(markers.pose1)
    p2 = np.asarray(markers.pose2)
    und = np.asarray(markers.und_corners)

    candidates = []
    for i, slot in obs_idx:
        g2m_inv = np.linalg.inv(mk_pose[slot])
        for pose_k in (p1[i], p2[i]):
            candidates.append(pose_k @ g2m_inv)
    scores = []
    for T in candidates:
        err = 0.0
        for i, slot in obs_idx:
            err += _reproj_corner_err(
                mk_pose[slot], T, und[i], float(mk_size[slot]), cam
            )
        scores.append(err / len(obs_idx))
    order = np.argsort(scores)
    best = order[0]
    if len(order) > 1:
        # ambiguity: runner-up must be clearly worse OR agree with winner
        second = scores[order[1]]
        agree = np.linalg.norm(candidates[order[1]] - candidates[best]) < 0.05
        if not agree and second < min_err_ratio * max(scores[best], 1e-6):
            return None
    if scores[best] > 5.0:
        return None
    # refine the winner on ALL observed marker corners (8-64 points) with
    # the motion-only LM — a single marker's IPPE pose is far noisier than
    # the joint corner solution
    PAD = 64  # fixed residual count: one compile for any marker count
    pts3d = np.zeros((PAD, 3), np.float32)
    uv = np.zeros((PAD, 2), np.float32)
    k = 0
    for i, slot in obs_idx:
        if k + 4 > PAD:
            break
        obj = np.asarray(marker_object_points(jnp.float32(float(mk_size[slot]))))
        pts3d[k : k + 4] = obj @ mk_pose[slot][:3, :3].T + mk_pose[slot][:3, 3]
        uv[k : k + 4] = und[i]
        k += 4
    from ucoslam_tpu.optim.pnp import motion_only_lm

    res = motion_only_lm(
        jnp.asarray(candidates[best].astype(np.float32)),
        jnp.asarray(pts3d),
        jnp.asarray(uv),
        jnp.ones(PAD),
        jnp.asarray(np.arange(PAD) < k),
        cam,
        iters=10,
        rounds=2,
    )
    if int(res.n_inliers) >= 4:
        return np.asarray(res.pose_f2g).astype(np.float32)
    return candidates[best].astype(np.float32)
