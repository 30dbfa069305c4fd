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
    args = list(make_problem(P=256, N=128))
    args[3] = np.zeros(256, bool)  # no valid points
    idx, best, second = project_match_pallas(
        *[jnp.asarray(a) for a in args], interpret=True
    )
    assert (np.asarray(best) == INVALID_DIST).all()
    assert (np.asarray(idx) == -1).all()
