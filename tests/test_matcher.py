"""Frame-to-frame matcher tests (ratio, rotation, epipolar gates)."""

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.geometry import CameraParams, se3_exp, se3_apply, fundamental_from_poses
from ucoslam_tpu.mapping.frame import empty_frame
from ucoslam_tpu.matching import match_frames, match_frames_epipolar

RNG = np.random.default_rng(31)
CAM = CameraParams.create(500.0, 500.0, 320.0, 240.0)


def make_pair(n=128, flip_bits=6):
    """Two frames sharing descriptors with slight corruption."""
    desc1 = RNG.integers(0, 2**32, (n, 8), dtype=np.uint32)
    desc2 = desc1.copy()
    # flip a few bits in each descriptor
    for i in range(n):
        for _ in range(flip_bits):
            w = RNG.integers(0, 8)
            desc2[i, w] ^= np.uint32(1) << np.uint32(RNG.integers(0, 32))
    perm = RNG.permutation(n)
    f1 = empty_frame(n)._replace(
        desc=jnp.asarray(desc1), valid=jnp.ones(n, bool),
        und_xy=jnp.asarray(RNG.uniform(0, 640, (n, 2)).astype(np.float32)),
    )
    f2 = empty_frame(n)._replace(
        desc=jnp.asarray(desc2[perm]), valid=jnp.ones(n, bool),
        und_xy=jnp.asarray(RNG.uniform(0, 640, (n, 2)).astype(np.float32)),
    )
    return f1, f2, perm


def test_match_frames_finds_permutation():
    f1, f2, perm = make_pair()
    m = match_frames(f1, f2, jnp.float32(50.0), check_rotation=False)
    idx = np.asarray(m.train_idx)
    v = np.asarray(m.valid)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    assert v.sum() > 120
    assert (idx[v] == inv[v]).mean() > 0.99


def test_rotation_consistency_filters():
    f1, f2, perm = make_pair()
    # consistent global rotation of pi/4 except a few bad apples.
    # f2 keypoint j carries descriptor perm[j], so its angle must be
    # ang1[perm[j]] + pi/4 for the matched pair to be consistent.
    ang1 = RNG.uniform(-np.pi, np.pi, 128).astype(np.float32)
    ang2 = (ang1[perm] + np.pi / 4).astype(np.float32)
    bad = RNG.choice(128, 15, replace=False)  # f1 indices to corrupt
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    ang2[inv[bad]] = RNG.uniform(-np.pi, np.pi, 15)
    f1 = f1._replace(angle=jnp.asarray(ang1))
    f2 = f2._replace(angle=jnp.asarray(ang2))
    m = match_frames(f1, f2, jnp.float32(50.0), check_rotation=True)
    v = np.asarray(m.valid)
    # a random angle lands in the 3 dominant of 30 bins ~10% of the time
    assert v[bad].sum() <= 5  # most inconsistent matches rejected
    assert v.sum() > 90


def test_epipolar_gate():
    n = 100
    X = RNG.uniform(-1, 1, (n, 3)).astype(np.float32)
    X[:, 2] += 5
    T1 = jnp.eye(4)
    T2 = se3_exp(jnp.asarray([0.3, 0.0, 0.0, 0.0, 0.05, 0.0]))
    uv1 = np.asarray(CAM.project(se3_apply(T1, jnp.asarray(X))))
    uv2 = np.asarray(CAM.project(se3_apply(T2, jnp.asarray(X))))
    desc1 = RNG.integers(0, 2**32, (n, 8), dtype=np.uint32)
    f1 = empty_frame(n)._replace(
        desc=jnp.asarray(desc1), valid=jnp.ones(n, bool), und_xy=jnp.asarray(uv1)
    )
    # same descriptors but also a decoy far from the epipolar line
    f2 = empty_frame(n)._replace(
        desc=jnp.asarray(desc1), valid=jnp.ones(n, bool), und_xy=jnp.asarray(uv2)
    )
    F12 = fundamental_from_poses(T1, T2, CAM, CAM)
    m = match_frames_epipolar(
        f1, f2, F12, jnp.ones(n), jnp.float32(50.0), only_unassigned=False
    )
    v = np.asarray(m.valid)
    idx = np.asarray(m.train_idx)
    assert v.sum() > 80
    assert (idx[v] == np.arange(n)[v]).all()
    # corrupt geometry: shuffle uv2 so epipolar constraint broken
    f2b = f2._replace(und_xy=jnp.asarray(uv2[RNG.permutation(n)]))
    m2 = match_frames_epipolar(
        f1, f2b, F12, jnp.ones(n), jnp.float32(50.0), only_unassigned=False
    )
    assert int(m2.n_matches) < int(m.n_matches) / 2


def test_match_frames_bow_word_alignment():
    """FrameMatcher_BoW counterpart: only same-word pairs may match, exact
    duplicates always share a word, and the matcher recovers the planted
    correspondences."""
    from ucoslam_tpu.mapping.kfdatabase import make_vocabulary, quantize_words
    from ucoslam_tpu.matching.matcher import match_frames_bow

    n = 128
    vocab = make_vocabulary(256)
    desc = RNG.integers(0, 2**32, (n, 8), dtype=np.uint32)
    f1 = empty_frame(n)._replace(desc=jnp.asarray(desc), valid=jnp.ones(n, bool))
    perm = RNG.permutation(n)
    f2 = empty_frame(n)._replace(
        desc=jnp.asarray(desc[perm]), valid=jnp.ones(n, bool)
    )
    m = match_frames_bow(
        f1, f2, vocab, jnp.float32(50.0), check_rotation=False
    )
    v = np.asarray(m.valid)
    idx = np.asarray(m.train_idx)
    # exact duplicates share their word; expect near-total recovery
    assert v.sum() >= 0.95 * n, v.sum()
    inv = np.argsort(perm)
    assert (idx[v] == inv[np.arange(n)][v]).all()
    # and every accepted pair shares a vocabulary word by construction
    w1 = np.asarray(quantize_words(f1.desc, vocab))
    w2 = np.asarray(quantize_words(f2.desc, vocab))
    assert (w1[v] == w2[idx[v]]).all()
