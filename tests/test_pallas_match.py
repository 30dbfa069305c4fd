"""Pallas fused projection-match kernel vs the XLA reference (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.ops.hamming import INVALID_DIST, hamming_matrix, match_best2
from ucoslam_tpu.ops.pallas.match_kernel import project_match_pallas

RNG = np.random.default_rng(91)


def reference(desc_a, uv_a, oct_a, valid_a, desc_b, uv_b, oct_b, valid_b, radius2):
    d = hamming_matrix(jnp.asarray(desc_a), jnp.asarray(desc_b))
    du = uv_a[:, None, 0] - uv_b[None, :, 0]
    dv = uv_a[:, None, 1] - uv_b[None, :, 1]
    in_r = (du * du + dv * dv) < radius2[None, :]
    oct_ok = np.abs(oct_a[:, None] - oct_b[None, :]) <= 1
    mask = in_r & oct_ok & valid_a[:, None] & valid_b[None, :]
    return match_best2(d, extra_mask=jnp.asarray(mask))


def make_problem(P=256, N=256):
    desc_a = RNG.integers(0, 2**32, (P, 8), dtype=np.uint32)
    desc_b = RNG.integers(0, 2**32, (N, 8), dtype=np.uint32)
    # half the rows share descriptors with some columns => real best matches
    share = RNG.choice(N, P // 2, replace=True)
    desc_a[: P // 2] = desc_b[share]
    uv_a = RNG.uniform(0, 640, (P, 2)).astype(np.float32)
    uv_b = RNG.uniform(0, 640, (N, 2)).astype(np.float32)
    uv_b[share] = uv_a[: P // 2] + RNG.normal(0, 3, (P // 2, 2))
    oct_a = RNG.integers(0, 4, P).astype(np.int32)
    oct_b = RNG.integers(0, 4, N).astype(np.int32)
    oct_b[share] = oct_a[: P // 2]
    valid_a = RNG.random(P) < 0.9
    valid_b = RNG.random(N) < 0.9
    radius2 = np.full(N, 400.0, np.float32)
    return desc_a, uv_a, oct_a, valid_a, desc_b, uv_b, oct_b, valid_b, radius2


def test_matches_reference():
    args = make_problem()
    ref_idx, ref_best, ref_second = reference(*args)
    idx, best, second = project_match_pallas(
        jnp.asarray(args[0]), jnp.asarray(args[1]), jnp.asarray(args[2]),
        jnp.asarray(args[3]), jnp.asarray(args[4]), jnp.asarray(args[5]),
        jnp.asarray(args[6]), jnp.asarray(args[7]), jnp.asarray(args[8]),
        interpret=True,
    )
    best = np.asarray(best)
    ref_best = np.asarray(ref_best)
    np.testing.assert_array_equal(best, ref_best)
    np.testing.assert_array_equal(np.asarray(second), np.asarray(ref_second))
    has = best < INVALID_DIST
    np.testing.assert_array_equal(np.asarray(idx)[has], np.asarray(ref_idx)[has])


def test_all_masked_rows():
    args = list(make_problem(P=256, N=256))
    args[3] = np.zeros(256, bool)  # no valid points
    idx, best, second = project_match_pallas(
        *[jnp.asarray(a) for a in args], interpret=True
    )
    assert (np.asarray(best) == INVALID_DIST).all()
    assert (np.asarray(idx) == -1).all()


def test_multi_tile_merge():
    """Best/second/argbest must merge correctly across column tiles."""
    args = make_problem(P=256, N=512)
    ref_idx, ref_best, ref_second = reference(*args)
    idx, best, second = project_match_pallas(
        *[jnp.asarray(a) for a in args], interpret=True
    )
    np.testing.assert_array_equal(np.asarray(best), np.asarray(ref_best))
    np.testing.assert_array_equal(np.asarray(second), np.asarray(ref_second))
    has = np.asarray(best) < INVALID_DIST
    np.testing.assert_array_equal(np.asarray(idx)[has], np.asarray(ref_idx)[has])


def test_production_matcher_backend_equivalence():
    """match_points_to_frame output is identical on the pallas and xla
    backends (pallas in interpret mode off-TPU)."""
    import jax
    from ucoslam_tpu.geometry.camera import CameraParams
    from ucoslam_tpu.mapping.frame import empty_frame
    from ucoslam_tpu.matching import projection

    rng = np.random.default_rng(5)
    L, N = 512, 256
    cam = CameraParams.create(500.0, 500.0, 320.0, 240.0)
    X = rng.uniform(-3, 3, (L, 3)).astype(np.float32)
    X[:, 2] = rng.uniform(2, 20, L)
    dist = np.linalg.norm(X, axis=1)
    pt_desc = rng.integers(0, 2**32, (L, 8), dtype=np.uint32)
    frame_desc = rng.integers(0, 2**32, (N, 8), dtype=np.uint32)
    xy = rng.uniform(0, 640, (N, 2)).astype(np.float32)
    sel = rng.choice(L, 100, replace=False)
    ksel = rng.choice(N, 100, replace=False)
    frame_desc[ksel] = pt_desc[sel]
    uv = np.asarray(cam.project(jnp.asarray(X)))
    xy[ksel] = uv[sel] + rng.normal(0, 2, (100, 2))
    frame = empty_frame(N)._replace(
        und_xy=jnp.asarray(xy),
        desc=jnp.asarray(frame_desc),
        octave=jnp.asarray(rng.integers(0, 8, N, dtype=np.int32)),
        valid=jnp.asarray(rng.random(N) < 0.95),
    )
    kw = dict(
        pt_pos=jnp.asarray(X),
        pt_desc=jnp.asarray(pt_desc),
        pt_normal=jnp.asarray((X / dist[:, None]).astype(np.float32)),
        pt_min_dist=jnp.asarray((dist / 1.2**7).astype(np.float32)),
        pt_max_dist=jnp.asarray((dist * 1.3).astype(np.float32)),
        pt_valid=jnp.asarray(rng.random(L) < 0.9),
        frame=frame,
        cam=cam,
        pose_f2g=jnp.eye(4),
        proj_dist_thr=jnp.float32(15.0),
        max_desc_dist=jnp.float32(60.0),
        scale_factor=jnp.float32(1.2),
    )
    try:
        projection.set_match_backend("xla")
        r_x = jax.tree.map(np.asarray, projection.match_points_to_frame(**kw))
        projection.set_match_backend("pallas")
        r_p = jax.tree.map(np.asarray, projection.match_points_to_frame(**kw))
    finally:
        projection.set_match_backend("auto")
    assert int(r_x.n_matched) > 10
    np.testing.assert_array_equal(r_x.kpt_idx, r_p.kpt_idx)
    np.testing.assert_array_equal(r_x.point_valid, r_p.point_valid)
    assert int(r_x.n_visible) == int(r_p.n_visible)
