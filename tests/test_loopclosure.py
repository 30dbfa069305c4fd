"""Loop closure: BoW database, detection, Sim3 map correction."""

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry import ate_rmse
from ucoslam_tpu.io import SyntheticSequence
from ucoslam_tpu.mapping.kfdatabase import KeyFrameDataBase
from ucoslam_tpu.slam import System

RNG = np.random.default_rng(81)

PARAMS = Params().replace(
    maxMapPoints=8192,
    maxKeyFrames=64,
    maxKeyPointsPerFrame=512,
    maxDescDistance=60.0,
    detectMarkers=False,
    # fast outward exploration: confidence vs the reference KF drops
    # quickly between keyframes, so lower the candidate-quality floor
    # (the same knob the reference's dataset presets tune, e.g. KITTI)
    KFMinConfidence=0.4,
)


class TestKFDataBase:
    def test_same_frame_scores_highest(self):
        db = KeyFrameDataBase(8)
        descs = [RNG.integers(0, 2**32, (64, 8), dtype=np.uint32) for _ in range(4)]
        for i, d in enumerate(descs):
            db.add(i, jnp.asarray(d), jnp.ones(64, bool))
        # query with a noisy copy of kf 2
        q = descs[2].copy()
        for j in range(64):
            q[j, RNG.integers(0, 8)] ^= np.uint32(1) << np.uint32(RNG.integers(0, 32))
        scores = db.query(jnp.asarray(q), jnp.ones(64, bool))
        assert scores[:4].argmax() == 2
        cands = db.relocalization_candidates(
            jnp.asarray(q), jnp.ones(64, bool),
            np.asarray([True] * 4 + [False] * 4),
        )
        assert cands[0] == 2

    def test_exclude(self):
        db = KeyFrameDataBase(4)
        d = RNG.integers(0, 2**32, (32, 8), dtype=np.uint32)
        db.add(0, jnp.asarray(d), jnp.ones(32, bool))
        db.add(1, jnp.asarray(d), jnp.ones(32, bool))
        c = db.relocalization_candidates(
            jnp.asarray(d), jnp.ones(32, bool), np.asarray([True, True, False, False]),
            exclude={0},
        )
        assert 0 not in c and 1 in c

    def test_dummy_database_returns_nothing(self):
        """DummyDataBase path (keyframedatabase.cpp:98): no vocabulary ->
        add is a no-op and no candidates are returned."""
        db = KeyFrameDataBase(4, dummy=True)
        d = RNG.integers(0, 2**32, (32, 8), dtype=np.uint32)
        db.add(0, jnp.asarray(d), jnp.ones(32, bool))
        assert int((np.asarray(db.word_ids) >= 0).sum()) == 0
        c = db.relocalization_candidates(
            jnp.asarray(d), jnp.ones(32, bool), np.asarray([True] * 4)
        )
        assert c == []

    def test_covis_grouping_collapses_neighbours(self):
        """Two near-identical covisible keyframes must yield ONE candidate
        (the group's best), leaving room for a distinct place
        (keyframedatabase.cpp:250-304 grouping)."""
        db = KeyFrameDataBase(8)
        d = RNG.integers(0, 2**32, (64, 8), dtype=np.uint32)
        noisy = d.copy()
        for j in range(64):
            noisy[j, RNG.integers(0, 8)] ^= np.uint32(1) << np.uint32(
                RNG.integers(0, 32)
            )
        other = RNG.integers(0, 2**32, (64, 8), dtype=np.uint32)
        db.add(0, jnp.asarray(d), jnp.ones(64, bool))
        db.add(1, jnp.asarray(noisy), jnp.ones(64, bool))
        db.add(2, jnp.asarray(other), jnp.ones(64, bool))
        covis = np.zeros((8, 8))
        covis[0, 1] = covis[1, 0] = 50  # kf0 and kf1 are covisible
        active = np.asarray([True] * 3 + [False] * 5)
        c = db.relocalization_candidates(
            jnp.asarray(d), jnp.ones(64, bool), active, covis=covis
        )
        # both members of the (0,1) group must not appear
        assert not (0 in c and 1 in c), c
        assert 0 in c or 1 in c


class TestOrbitE2E:
    def test_orbit_explores_and_closes_seamlessly(self):
        """360-degree outward orbit: exploration + return.

        In oracle mode descriptors are globally stable, so on return the
        tracker re-associates the original points directly and the map
        stays connected — no pose-graph event needed (and the detector
        correctly refuses: candidates are covisible). The gate here is
        coverage + accuracy around the full loop.
        """
        seq = SyntheticSequence(
            n_frames=140, seed=21, n_points=3000, trajectory="orbit_out",
            noise_px=0.4,
        )
        sys_ = System(PARAMS, seq.cam)
        poses = {}
        for i in range(seq.n_frames):
            p = sys_.process_frame(seq.frame(i))
            if p is not None:
                poses[i] = p
        assert len(poses) >= 0.9 * (seq.n_frames - 2), f"tracked {len(poses)}"
        idx = sorted(poses)
        est = np.stack([-poses[i][:3, :3].T @ poses[i][:3, 3] for i in idx])
        ate = ate_rmse(est, seq.gt_positions()[idx], with_scale=True)
        assert ate < 0.1, f"orbit ATE {ate}"


class TestLoopCorrection:
    def _drifted_loop_map(self, n_kf=10, n_pt_per=60):
        """A chain of keyframes with injected odometry drift + ground truth.

        Keyframes k and k+1 share points; the LAST keyframe also truly
        observes the FIRST keyframe's points (the loop), but its stored
        pose carries accumulated drift.
        """
        from ucoslam_tpu.geometry.se3 import se3_exp
        from ucoslam_tpu.mapping.frame import empty_frame
        from ucoslam_tpu.mapping import Map
        import jax.numpy as jnp

        params = PARAMS.replace(maxKeyFrames=16, maxMapPoints=2048, maxKeyPointsPerFrame=256)
        m = Map(params)
        cam = __import__("ucoslam_tpu.geometry", fromlist=["CameraParams"]).CameraParams.create(
            500.0, 500.0, 320.0, 240.0
        )
        rng = np.random.default_rng(3)
        # ring of cameras, each looking outward
        true_poses = []
        for k in range(n_kf):
            ang = 2 * np.pi * k / n_kf
            eye = np.asarray([1.5 * np.sin(ang), 0.0, 1.5 * np.cos(ang)])
            from ucoslam_tpu.io.synthetic import _lookat

            R, t = _lookat(eye, eye + np.asarray([4 * np.sin(ang), 0, 4 * np.cos(ang)]))
            true_poses.append(
                np.vstack([np.hstack([R, t[:, None]]), [0, 0, 0, 1]]).astype(np.float32)
            )
        # points in front of each camera (world frame)
        all_pts, all_desc, owner = [], [], []
        for k in range(n_kf):
            Tinv = np.linalg.inv(true_poses[k])
            local = np.stack(
                [rng.uniform(-1.5, 1.5, n_pt_per), rng.uniform(-1, 1, n_pt_per),
                 rng.uniform(3, 6, n_pt_per)], -1)
            world = local @ Tinv[:3, :3].T + Tinv[:3, 3]
            all_pts.append(world.astype(np.float32))
            all_desc.append(rng.integers(0, 2**32, (n_pt_per, 8), dtype=np.uint32))
            owner.append(np.full(n_pt_per, k))
        # drifted poses: accumulate error along the chain
        drift_poses = [true_poses[0]]
        for k in range(1, n_kf):
            rel = true_poses[k] @ np.linalg.inv(true_poses[k - 1])
            noise = np.asarray(
                se3_exp(jnp.asarray((rng.normal(0, 0.015, 6)).astype(np.float32)))
            )
            drift_poses.append(noise @ rel @ drift_poses[-1])

        # store each point where its OWNER keyframe's drifted pose puts it
        # (a real map is internally consistent with its drifted keyframes)
        pts_true = np.concatenate(all_pts)
        owner_arr = np.concatenate(owner)
        pts = pts_true.copy()
        for k in range(n_kf):
            sel = owner_arr == k
            corr = np.linalg.inv(drift_poses[k]) @ true_poses[k]
            pts[sel] = pts_true[sel] @ corr[:3, :3].T + corr[:3, 3]
        descs = np.concatenate(all_desc)
        # scale band from the OWNER camera's true viewing distance (the
        # production invariant: predictScale(view_dist) ~ detection octave)
        centers = np.stack(
            [-T[:3, :3].T @ T[:3, 3] for T in true_poses]
        )[owner_arr]
        dist = np.linalg.norm(pts_true - centers, axis=1)
        slots = m.add_points(pts, pts / np.linalg.norm(pts, axis=1)[:, None],
                             descs, dist / 1.2**7,
                             dist * 1.15, np.zeros(len(pts), np.int32), 0)

        import jax.numpy as jnp2

        for k in range(n_kf):
            ids = np.full(256, -1, np.int32)
            sel = np.nonzero((owner[0] * 0 + 1))[0]
            # kf k observes its own points and neighbour k-1's points
            obs_pts = [k * n_pt_per + np.arange(n_pt_per)]
            if k > 0:
                obs_pts.append((k - 1) * n_pt_per + np.arange(n_pt_per))
            obs = np.concatenate(obs_pts)[:256]
            uv = np.zeros((256, 2), np.float32)
            dsc = np.zeros((256, 8), np.uint32)
            # pixel measurements come from TRUE geometry (what the camera saw)
            T = true_poses[k]
            cam_pts = pts_true[obs] @ T[:3, :3].T + T[:3, 3]
            uv_o = np.asarray(cam.project(jnp2.asarray(cam_pts)))
            nvalid = len(obs)
            uv[:nvalid] = uv_o + rng.normal(0, 0.3, uv_o.shape)
            dsc[:nvalid] = descs[obs]
            ids[:nvalid] = slots[obs]
            f = empty_frame(256)._replace(
                fseq=jnp2.int32(k * 12),  # big fseq gaps => not "recent"
                und_xy=jnp2.asarray(uv),
                desc=jnp2.asarray(dsc),
                valid=jnp2.asarray(np.arange(256) < nvalid),
                ids=jnp2.asarray(ids),
                pose_f2g=jnp2.asarray(drift_poses[k].astype(np.float32)),
            )
            m.add_keyframe(f)
        return m, cam, true_poses, drift_poses, params

    def test_detect_and_correct(self):
        import jax.numpy as jnp
        from ucoslam_tpu.mapping.frame import empty_frame
        from ucoslam_tpu.mapping.kfdatabase import KeyFrameDataBase
        from ucoslam_tpu.slam.loopclosure import LoopDetector

        m, cam, true_poses, drift_poses, params = self._drifted_loop_map()
        kfdb = KeyFrameDataBase(params.maxKeyFrames)
        st = m.state
        for k in range(10):
            kfdb.add(k, st.kf_desc[k], st.kf_kpt_valid[k])
        det = LoopDetector(params, cam, kfdb)

        # a "current" frame at the TRUE pose of kf0's position observing
        # kf0's points, but entering with kf9's drifted frame of reference
        rng = np.random.default_rng(9)
        pts = np.asarray(st.pt_pos)[:60]
        descs = np.asarray(st.pt_desc)[:60]
        T_true = true_poses[0]
        uv = np.asarray(cam.project(jnp.asarray(pts @ T_true[:3, :3].T + T_true[:3, 3])))
        f = empty_frame(256)._replace(
            fseq=jnp.int32(200),
            und_xy=jnp.asarray(np.pad(uv, ((0, 196), (0, 0))).astype(np.float32)),
            desc=jnp.asarray(np.vstack([descs, np.zeros((196, 8), np.uint32)])),
            valid=jnp.asarray(np.arange(256) < 60),
        )
        # register as a new keyframe: the camera truly sits back at the
        # start (it sees kf0's points) but its pose estimate carries the
        # chain's accumulated drift A9 = drift9 * true9^-1
        A9 = drift_poses[-1] @ np.linalg.inv(true_poses[-1])
        cur_drifted = (A9 @ true_poses[0]).astype(np.float32)
        kf_slot = m.add_keyframe(f._replace(pose_f2g=jnp.asarray(cur_drifted)))
        kfdb.add(kf_slot, f.desc, f.valid)

        info = det.detect_from_keypoints(m, kf_slot, f)
        assert info.found, "loop not detected"
        assert info.matched_kf == 0
        # expected pose close to truth
        err = np.linalg.norm(info.expected_pose - T_true)
        assert err < 0.05, f"loop pose err {err}"

        drift_before = np.linalg.norm(
            np.asarray(m.state.kf_pose)[9] - true_poses[9]
        )
        ok = det.correct_map(m, info)
        assert ok, "correction rejected"
        # keyframe poses pulled toward truth (up to the fixed-gauge frame)
        drift_after = np.linalg.norm(np.asarray(m.state.kf_pose)[9] - true_poses[9])
        assert drift_after < drift_before

    def test_seam_duplicates_fused_after_correction(self):
        """correctMap fuses duplicate landmarks across the loop seam
        (loopdetector.cpp:3024-3081): the returning keyframe mapped its own
        copies of the start's landmarks; after Sim3 relaxation the copies
        coincide with the originals and must merge (point count drops)."""
        import jax.numpy as jnp
        from ucoslam_tpu.mapping.frame import empty_frame
        from ucoslam_tpu.mapping.kfdatabase import KeyFrameDataBase
        from ucoslam_tpu.slam.loopclosure import LoopDetector

        m, cam, true_poses, drift_poses, params = self._drifted_loop_map()
        kfdb = KeyFrameDataBase(params.maxKeyFrames)
        st = m.state
        for k in range(10):
            kfdb.add(k, st.kf_desc[k], st.kf_kpt_valid[k])
        det = LoopDetector(params, cam, kfdb)

        # the returning camera truly sits at kf0's pose but believes the
        # drifted estimate; it has TRIANGULATED ITS OWN duplicate copies of
        # kf0's landmarks, consistent with its drifted pose
        pts_true = np.asarray(st.pt_pos)[:60]
        descs = np.asarray(st.pt_desc)[:60]
        A9 = drift_poses[-1] @ np.linalg.inv(true_poses[-1])
        cur_drifted = (A9 @ true_poses[0]).astype(np.float32)
        # duplicate world positions as seen from the drifted frame:
        # X_dup = drifted^-1 @ true @ X  (reprojects to the same pixels)
        corr = np.linalg.inv(cur_drifted) @ true_poses[0]
        pts_dup = (pts_true @ corr[:3, :3].T + corr[:3, 3]).astype(np.float32)
        c0 = -true_poses[0][:3, :3].T @ true_poses[0][:3, 3]
        dist = np.linalg.norm(pts_true - c0, axis=1)  # true viewing distance
        dup_slots = m.add_points(
            pts_dup, pts_dup / np.linalg.norm(pts_dup, axis=1)[:, None],
            descs, dist / 1.2**7, dist * 1.15, np.zeros(60, np.int32), 0,
        )

        T_true = true_poses[0]
        uv = np.asarray(
            cam.project(jnp.asarray(pts_true @ T_true[:3, :3].T + T_true[:3, 3]))
        )
        ids = np.full(256, -1, np.int32)
        ids[:60] = dup_slots  # keypoints claimed by the DUPLICATE slots
        f = empty_frame(256)._replace(
            fseq=jnp.int32(200),
            und_xy=jnp.asarray(np.pad(uv, ((0, 196), (0, 0))).astype(np.float32)),
            desc=jnp.asarray(np.vstack([descs, np.zeros((196, 8), np.uint32)])),
            valid=jnp.asarray(np.arange(256) < 60),
            ids=jnp.asarray(ids),
            pose_f2g=jnp.asarray(cur_drifted),
        )
        kf_slot = m.add_keyframe(f)
        kfdb.add(kf_slot, f.desc, f.valid)

        n_before = m.n_points
        info = det.detect_from_keypoints(m, kf_slot, f)
        assert info.found, "loop not detected"
        ok = det.correct_map(m, info)
        assert ok, "correction rejected"
        n_after = m.n_points
        assert n_after <= n_before - 30, (
            f"seam duplicates not fused: {n_before} -> {n_after}"
        )
        # the production hook runs a global BA right after correctMap
        # (mapmanager._detect_and_close_loop); the merged observations must
        # then settle to a consistent geometry
        from ucoslam_tpu.optim.ba import global_bundle_adjustment

        chi_merged = m.global_reproj_chi2(cam)
        global_bundle_adjustment(m, cam, n_iters=15)
        chi_ba = m.global_reproj_chi2(cam)
        assert np.isfinite(chi_ba) and chi_ba < max(0.5 * chi_merged, 6.0), (
            chi_merged, chi_ba,
        )
