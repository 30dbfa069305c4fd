"""Kernel-level unit tests: Hamming matching, FAST, image ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from ucoslam_tpu.ops import (
    hamming_matrix,
    hamming_matrix_mxu,
    match_best2,
    mutual_best,
    filter_ambiguous_train_sized,
    INVALID_DIST,
)
from ucoslam_tpu.ops.fast import fast_score_map, nms3x3, topk_grid, CIRCLE, BORDER
from ucoslam_tpu.ops.image import gaussian_blur, build_pyramid, patch_moment_maps, bilinear_sample

RNG = np.random.default_rng(7)


def np_popcount_matrix(a, b):
    ax = a[:, None, :] ^ b[None, :, :]
    return np.array(
        [[bin(int(w)).count("1") for w in row.reshape(-1)] for row in ax.reshape(-1, ax.shape[-1])]
    ).reshape(ax.shape).sum(-1)


class TestHamming:
    def test_matches_numpy(self):
        a = RNG.integers(0, 2**32, size=(16, 8), dtype=np.uint32)
        b = RNG.integers(0, 2**32, size=(24, 8), dtype=np.uint32)
        d = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        ref = np_popcount_matrix(a, b)
        np.testing.assert_array_equal(d, ref)

    def test_mxu_exact(self):
        a = RNG.integers(0, 2**32, size=(64, 8), dtype=np.uint32)
        b = RNG.integers(0, 2**32, size=(128, 8), dtype=np.uint32)
        d1 = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(b)))
        d2 = np.asarray(hamming_matrix_mxu(jnp.asarray(a), jnp.asarray(b)))
        np.testing.assert_array_equal(d1, d2)

    def test_identical_zero(self):
        a = RNG.integers(0, 2**32, size=(8, 8), dtype=np.uint32)
        d = np.asarray(hamming_matrix(jnp.asarray(a), jnp.asarray(a)))
        assert (np.diag(d) == 0).all()

    def test_match_best2(self):
        dist = jnp.asarray([[5, 2, 9], [1, 1, 3]], jnp.int32)
        idx, best, second = match_best2(dist)
        assert list(np.asarray(idx)) == [1, 0]
        assert list(np.asarray(best)) == [2, 1]
        assert list(np.asarray(second)) == [5, 1]

    def test_match_best2_masks(self):
        dist = jnp.asarray([[5, 2, 9]], jnp.int32)
        idx, best, _ = match_best2(dist, valid_cols=jnp.asarray([True, False, True]))
        assert int(idx[0]) == 0 and int(best[0]) == 5

    def test_mutual_best(self):
        dist = jnp.asarray([[1, 9], [9, 2], [3, 8]], jnp.int32)
        m = np.asarray(mutual_best(dist))
        assert m[0] == 0 and m[1] == 1 and m[2] == -1  # col0 prefers row0

    def test_filter_ambiguous(self):
        best_idx = jnp.asarray([0, 0, 1], jnp.int32)
        best_dist = jnp.asarray([4, 2, 7], jnp.int32)
        keep = np.asarray(filter_ambiguous_train_sized(best_idx, best_dist, 3))
        assert list(keep) == [False, True, True]


def np_fast_score(img, threshold):
    """Brute-force FAST-9/16 V-score reference."""
    h, w = img.shape
    out = np.zeros((h, w), np.float32)
    for y in range(BORDER, h - BORDER):
        for x in range(BORDER, w - BORDER):
            c = img[y, x]
            circ = np.array([img[y + dy, x + dx] for dy, dx in CIRCLE])
            best = 0.0
            for start in range(16):
                idx = [(start + i) % 16 for i in range(9)]
                bright = (circ[idx] - c).min()
                dark = (c - circ[idx]).min()
                best = max(best, bright, dark)
            if best > threshold:
                out[y, x] = best
    return out


class TestFAST:
    def test_score_matches_bruteforce(self):
        img = RNG.uniform(0, 255, size=(24, 32)).astype(np.float32)
        t = 10.0
        ours = np.asarray(fast_score_map(jnp.asarray(img), t))
        ref = np_fast_score(img, t)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_detects_synthetic_corner(self):
        img = np.zeros((32, 32), np.float32)
        img[12:, 12:] = 200.0  # bright square corner at (12,12)
        s = np.asarray(fast_score_map(jnp.asarray(img), 20.0))
        ys, xs = np.nonzero(s)
        assert len(ys) > 0
        assert (abs(ys - 12) <= 3).any() and (abs(xs - 12) <= 3).any()

    def test_nms_keeps_single_max(self):
        s = np.zeros((16, 16), np.float32)
        s[5, 5] = 10.0
        s[5, 6] = 8.0
        out = np.asarray(nms3x3(jnp.asarray(s)))
        assert out[5, 5] == 10.0 and out[5, 6] == 0.0

    def test_nms_plateau_single_survivor(self):
        s = np.zeros((16, 16), np.float32)
        s[5, 5] = s[5, 6] = 7.0
        out = np.asarray(nms3x3(jnp.asarray(s)))
        assert (out > 0).sum() == 1

    def test_topk_grid_spreads(self):
        s = np.zeros((64, 64), np.float32)
        # one strong cluster + isolated weak corners
        s[10, 10] = 100.0
        s[10, 11] = 99.0
        s[10, 12] = 98.0
        s[50, 50] = 5.0
        s[30, 55] = 4.0
        xy, vals, valid = topk_grid(jnp.asarray(s), cell=16, k_per_cell=2, total_k=8)
        got = {tuple(p) for p, v in zip(np.asarray(xy)[np.asarray(valid)], 1 * np.asarray(valid)) if v}
        # per-cell cap 2 forces the weak isolated corners in
        assert (50.0, 50.0) in got and (55.0, 30.0) in got
        assert np.asarray(valid).sum() == 4  # only 4 nonzero survive cap 2 in cluster cell


class TestImageOps:
    def test_gaussian_blur_matches_cv2(self):
        cv2 = pytest.importorskip("cv2")
        img = RNG.uniform(0, 255, size=(48, 64)).astype(np.float32)
        ref = cv2.GaussianBlur(img, (7, 7), 2.0, borderType=cv2.BORDER_REFLECT_101)
        ours = np.asarray(gaussian_blur(jnp.asarray(img)))
        np.testing.assert_allclose(ours, ref, atol=0.05)

    def test_pyramid_shapes(self):
        levels = build_pyramid(jnp.zeros((480, 640)), 8, 1.2)
        assert len(levels) == 8
        assert levels[0].shape == (480, 640)
        assert levels[1].shape == (400, 533)
        for a, b in zip(levels, levels[1:]):
            assert b.shape[0] < a.shape[0]

    def test_moment_maps_orientation(self):
        # gradient along +x => centroid to the right => angle ~ 0
        img = np.tile(np.arange(64, dtype=np.float32), (64, 1))
        m10, m01 = patch_moment_maps(jnp.asarray(img), 15)
        ang = np.arctan2(float(m01[32, 32]), float(m10[32, 32]))
        assert abs(ang) < 0.1
        # gradient along +y => angle ~ pi/2
        m10b, m01b = patch_moment_maps(jnp.asarray(img.T), 15)
        angb = np.arctan2(float(m01b[32, 32]), float(m10b[32, 32]))
        assert abs(angb - np.pi / 2) < 0.1

    def test_bilinear_sample(self):
        img = jnp.asarray(np.arange(16, dtype=np.float32).reshape(4, 4))
        v = bilinear_sample(img, jnp.asarray([[1.5, 0.5]]), mode="bilinear")
        assert abs(float(v[0]) - (1.5 + 0.5 * 4)) < 1e-5
