"""Map data model tests: arenas, mutation ops, covis, transforms, signatures."""

import numpy as np
import jax.numpy as jnp
import pytest

from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry import CameraParams, se3_exp
from ucoslam_tpu.mapping import Arena, Map
from ucoslam_tpu.mapping.frame import empty_frame

SMALL = Params().replace(
    maxMapPoints=64, maxKeyFrames=8, maxKeyPointsPerFrame=32, maxMarkers=4
)


def make_frame(n=32, fseq=0, seed=0, ids=None):
    rng = np.random.default_rng(seed)
    f = empty_frame(n)
    f = f._replace(
        fseq=jnp.int32(fseq),
        und_xy=jnp.asarray(rng.uniform(0, 640, (n, 2)).astype(np.float32)),
        desc=jnp.asarray(rng.integers(0, 2**32, (n, 8), dtype=np.uint32)),
        valid=jnp.ones((n,), bool),
        ids=jnp.asarray(ids if ids is not None else np.full(n, -1, np.int32)),
    )
    return f


class TestArena:
    def test_lowest_first_and_reuse(self):
        a = Arena(8)
        assert a.alloc() == 0 and a.alloc() == 1 and a.alloc() == 2
        a.free([1])
        assert a.alloc() == 1  # reuse lowest freed slot
        assert a.n_active == 3

    def test_alloc_many_overflow(self):
        a = Arena(4)
        a.alloc_many(3)
        with pytest.raises(RuntimeError):
            a.alloc_many(2)


class TestMap:
    def test_add_keyframe_and_points(self):
        m = Map(SMALL)
        ids = np.full(32, -1, np.int32)
        slots = m.add_points(
            pos=np.ones((5, 3)), normal=np.zeros((5, 3)),
            desc=np.zeros((5, 8), np.uint32),
            min_dist=np.zeros(5), max_dist=np.ones(5) * 10,
            flags=np.zeros(5, np.int32), creation_kf=0,
        )
        assert list(slots) == [0, 1, 2, 3, 4]
        ids[:5] = slots
        kf = m.add_keyframe(make_frame(ids=ids))
        assert kf == 0 and m.n_keyframes == 1 and m.n_points == 5
        m.check_consistency()

    def test_observation_counts_and_covis(self):
        m = Map(SMALL)
        slots = m.add_points(
            np.random.randn(6, 3), np.zeros((6, 3)), np.zeros((6, 8), np.uint32),
            np.zeros(6), np.ones(6), np.zeros(6, np.int32), 0,
        )
        ids0 = np.full(32, -1, np.int32)
        ids0[:6] = slots  # kf0 sees all 6
        ids1 = np.full(32, -1, np.int32)
        ids1[:3] = slots[:3]  # kf1 sees 3 shared
        m.add_keyframe(make_frame(ids=ids0, fseq=0))
        m.add_keyframe(make_frame(ids=ids1, fseq=1, seed=1))
        counts = m.point_observation_counts()
        assert list(counts[:6]) == [2, 2, 2, 1, 1, 1]
        covis = m.covis_matrix()
        assert covis[0, 1] == 3 and covis[1, 0] == 3 and covis[0, 0] == 0

    def test_remove_point_clears_observations(self):
        m = Map(SMALL)
        slots = m.add_points(
            np.zeros((3, 3)), np.zeros((3, 3)), np.zeros((3, 8), np.uint32),
            np.zeros(3), np.ones(3), np.zeros(3, np.int32), 0,
        )
        ids = np.full(32, -1, np.int32)
        ids[:3] = slots
        m.add_keyframe(make_frame(ids=ids))
        m.remove_points([slots[1]])
        got = np.asarray(m.state.kf_ids)[0, :3]
        assert list(got) == [0, -1, 2]
        m.check_consistency()

    def test_remove_keyframe(self):
        m = Map(SMALL)
        m.add_keyframe(make_frame())
        m.add_keyframe(make_frame(fseq=1))
        m.remove_keyframes([0])
        assert m.n_keyframes == 1
        assert not bool(np.asarray(m.state.kf_active)[0])
        m.check_consistency()

    def test_apply_transform_preserves_reprojection(self):
        cam = CameraParams.create(500, 500, 320, 240)
        m = Map(SMALL)
        rng = np.random.default_rng(2)
        X = rng.uniform(-1, 1, (10, 3)).astype(np.float32)
        X[:, 2] += 5
        slots = m.add_points(
            X, np.zeros((10, 3)), np.zeros((10, 8), np.uint32),
            np.zeros(10), np.ones(10) * 100, np.zeros(10, np.int32), 0,
        )
        f = make_frame()
        uv = np.asarray(cam.project(jnp.asarray(X)))
        ids = np.full(32, -1, np.int32)
        ids[:10] = slots
        f = f._replace(und_xy=jnp.asarray(np.pad(uv, ((0, 22), (0, 0)))), ids=jnp.asarray(ids))
        m.add_keyframe(f)
        chi_before = m.global_reproj_chi2(cam)
        assert chi_before < 1e-4
        T = se3_exp(jnp.asarray([0.3, -0.2, 0.5, 0.1, 0.05, -0.2]))
        m.apply_transform(np.asarray(T))
        chi_after = m.global_reproj_chi2(cam)
        assert chi_after < 1e-3  # invariant under rigid map transform

    def test_scale(self):
        m = Map(SMALL)
        m.add_points(
            np.ones((2, 3)), np.zeros((2, 3)), np.zeros((2, 8), np.uint32),
            np.zeros(2), np.ones(2), np.zeros(2, np.int32), 0,
        )
        m.add_keyframe(make_frame())
        m.scale(2.0)
        assert np.allclose(np.asarray(m.state.pt_pos)[0], 2.0)

    def test_signature_deterministic_and_sensitive(self):
        def build():
            m = Map(SMALL)
            m.add_points(
                np.ones((2, 3)), np.zeros((2, 3)), np.zeros((2, 8), np.uint32),
                np.zeros(2), np.ones(2), np.zeros(2, np.int32), 0,
            )
            m.add_keyframe(make_frame())
            return m

        a, b = build(), build()
        assert a.signature() == b.signature()
        b.scale(1.5)
        assert a.signature() != b.signature()

    def test_reference_keyframe(self):
        m = Map(SMALL)
        f0 = make_frame()
        T1 = np.asarray(se3_exp(jnp.asarray([5.0, 0, 0, 0, 0, 0])), np.float32)
        f1 = make_frame(fseq=1)._replace(pose_f2g=jnp.asarray(T1))
        m.add_keyframe(f0)
        m.add_keyframe(f1)
        assert m.reference_keyframe(np.eye(4, dtype=np.float32)) == 0
        assert m.reference_keyframe(T1) == 1


class TestPointStats:
    def test_update_point_stats(self):
        from ucoslam_tpu.mapping.map import op_update_point_stats

        m = Map(SMALL)
        X = np.asarray([[0.0, 0.0, 5.0], [1.0, 0.0, 6.0]], np.float32)
        desc0 = np.zeros((2, 8), np.uint32)
        slots = m.add_points(
            X, np.zeros((2, 3)), desc0, np.ones(2), np.ones(2) * 2,
            np.zeros(2, np.int32), 0,
        )
        rng = np.random.default_rng(3)
        desc_kf = rng.integers(0, 2**32, (32, 8), dtype=np.uint32)
        ids = np.full(32, -1, np.int32)
        ids[:2] = slots
        f = make_frame(ids=ids)._replace(desc=jnp.asarray(desc_kf))
        m.add_keyframe(f)
        st = op_update_point_stats(m.state, jnp.float32(1.2), jnp.int32(8))
        # normal: viewing direction from origin camera to the point
        n0 = np.asarray(st.pt_normal)[0]
        np.testing.assert_allclose(n0, [0, 0, 1], atol=1e-5)
        # scale bounds: max = dist * 1.2^0 = 5; min = 5 / 1.2^7
        assert abs(float(st.pt_max_dist[0]) - 5.0) < 1e-3
        assert abs(float(st.pt_min_dist[0]) - 5.0 / 1.2**7) < 1e-3
        # representative descriptor adopted from the observing keyframe
        np.testing.assert_array_equal(np.asarray(st.pt_desc)[0], desc_kf[0])
        # untouched inactive slots stay put
        np.testing.assert_array_equal(
            np.asarray(st.pt_desc)[5], np.zeros(8, np.uint32)
        )


def test_essential_graph_spans_and_keeps_strong_edges():
    """Kruskal max-spanning tree + strong covis links (CovisGraph::getEG,
    covisgraph.cpp:253-289)."""
    from ucoslam_tpu.config import Params
    from ucoslam_tpu.mapping import Map
    from ucoslam_tpu.mapping.frame import empty_frame
    import jax.numpy as jnp

    params = Params().replace(maxMapPoints=512, maxKeyFrames=8, maxKeyPointsPerFrame=64)
    m = Map(params)
    rng = np.random.default_rng(3)
    n_pt = 60
    X = rng.uniform(-2, 2, (n_pt, 3)).astype(np.float32)
    X[:, 2] += 6
    desc = rng.integers(0, 2**32, (n_pt, 8), dtype=np.uint32)
    d = np.linalg.norm(X, axis=1)
    slots = m.add_points(X, X / d[:, None], desc, d * 0.3, d * 1.5,
                         np.zeros(n_pt, np.int32), 0)
    # chain 0-1 (30 shared), 1-2 (30), 2-3 (25); weak 0-3 link (5 shared)
    shares = {0: slots[:40], 1: slots[10:50], 2: slots[20:60], 3: slots[35:60]}
    for k in range(4):
        ids = np.full(64, -1, np.int32)
        ids[: len(shares[k])] = shares[k]
        f = empty_frame(64)._replace(
            fseq=jnp.int32(k), valid=jnp.asarray(np.arange(64) < len(shares[k])),
            ids=jnp.asarray(ids), pose_f2g=jnp.eye(4),
        )
        m.add_keyframe(f)
    edges = m.essential_graph(min_weight=15)
    nodes = set()
    for a, b, w in edges:
        nodes.add(a); nodes.add(b)
    assert nodes == set(int(s) for s in m.keyframes.active_slots())
    # spanning: union-find check
    parent = {n: n for n in nodes}
    def find(x):
        while parent[x] != x: x = parent[x]
        return x
    for a, b, _ in edges:
        parent[find(a)] = find(b)
    assert len({find(n) for n in nodes}) == 1
    # strong consecutive links present with their covis weight
    pairs = {(a, b): w for a, b, w in edges}
    assert pairs.get((0, 1), 0) >= 30
    assert pairs.get((1, 2), 0) >= 30
    # weak 0-3 link (5 shared) excluded unless it is an MST bridge
    assert (0, 3) not in pairs or pairs[(0, 3)] <= 5
