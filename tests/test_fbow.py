"""fbow vocabulary file format: write/read round-trip, DB integration."""

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.io.fbow import FBOW_MAGIC, load_fbow, save_fbow
from ucoslam_tpu.mapping.kfdatabase import KeyFrameDataBase, bow_vector

RNG = np.random.default_rng(99)


def test_fbow_roundtrip(tmp_path):
    W = 300
    desc = RNG.integers(0, 2**32, (W, 8), dtype=np.uint32)
    weight = RNG.uniform(0.1, 2.0, W).astype(np.float32)
    path = str(tmp_path / "v.fbow")
    save_fbow(path, desc, weight, desc_name="orb")
    v = load_fbow(path)
    assert v.desc_name == "orb"
    assert v.desc.shape == (W, 8)
    # leaves come back grouped by chunk in order: word_id identifies them
    order = np.argsort(v.word_id)
    np.testing.assert_array_equal(v.desc[order], desc)
    np.testing.assert_allclose(v.weight[order], weight, rtol=1e-6)


def test_fbow_magic_checked(tmp_path):
    p = tmp_path / "bad.fbow"
    p.write_bytes(b"\x00" * 256)
    import pytest

    with pytest.raises(ValueError, match="magic"):
        load_fbow(str(p))


def test_database_with_file_vocab(tmp_path):
    W, N = 256, 64
    desc = RNG.integers(0, 2**32, (W, 8), dtype=np.uint32)
    path = str(tmp_path / "v.fbow")
    save_fbow(path, desc)
    db = KeyFrameDataBase(8)
    db.load_vocabulary(path)
    assert db.vocab.shape == (W, 8)
    frame_desc = jnp.asarray(desc[RNG.integers(0, W, N)])
    valid = jnp.ones(N, bool)
    db.add(0, frame_desc, valid)
    scores = db.query(frame_desc, valid)
    assert scores[0] > 0.99  # same frame scores ~1


def test_chunked_argmin_matches_dense():
    # chunked path (V > 8192) must quantize identically to the dense path
    V, N = 9000, 128
    vocab = jnp.asarray(RNG.integers(0, 2**32, (V, 8), dtype=np.uint32))
    desc = jnp.asarray(RNG.integers(0, 2**32, (N, 8), dtype=np.uint32))
    valid = jnp.ones(N, bool)
    hist_chunked = np.asarray(bow_vector(desc, valid, vocab))
    from ucoslam_tpu.ops.hamming import hamming_matrix

    d = np.asarray(hamming_matrix(desc, vocab))
    word = d.argmin(1)
    hist = np.zeros(V, np.float32)
    np.add.at(hist, word, 1.0)
    hist /= np.linalg.norm(hist)
    np.testing.assert_allclose(hist_chunked, hist, atol=1e-6)


def test_trained_vocab_beats_random_on_revisit():
    """VERDICT r3 gate: the trained vocabulary (data/vocab.fbow, trained by
    features/vocab_trainer over rendered imagery) must give better place-
    recognition top-1 accuracy than the default random-centroid vocab on a
    re-visit query set (ref: trained orb.fbow, fbow.h:54;
    keyframedatabase.cpp:195)."""
    import os
    import pytest

    from ucoslam_tpu.features.orb import ORBExtractor
    from ucoslam_tpu.io.fbow import default_vocab_path
    from ucoslam_tpu.io.synthetic import SyntheticSequence

    voc = default_vocab_path()
    if voc is None:
        pytest.skip("no trained vocabulary committed")

    # DB pass and query pass over the SAME trajectory with a brightness
    # perturbation: each query frame should retrieve its own DB frame
    seq_db = SyntheticSequence(n_frames=10, n_points=1500, seed=301)
    seq_q = SyntheticSequence(
        n_frames=10, n_points=1500, seed=301, brightness_drift=0.15
    )
    orb = ORBExtractor(max_features=1000)
    feats_db, feats_q = [], []
    for i in range(10):
        feats_db.append(orb.detect_and_compute(np.asarray(seq_db.render(i), np.float32)))
        feats_q.append(orb.detect_and_compute(np.asarray(seq_q.render(i), np.float32)))

    def top1_accuracy(db):
        for i, f in enumerate(feats_db):
            db.add(i, f.desc, f.valid)
        hits = 0
        for i, f in enumerate(feats_q):
            s = db.query(f.desc, f.valid)[:10]
            if abs(int(np.argmax(s)) - i) <= 1:  # neighbouring view ok
                hits += 1
        return hits / 10.0

    trained = KeyFrameDataBase(16)
    trained.load_vocabulary(voc)
    acc_trained = top1_accuracy(trained)
    random_db = KeyFrameDataBase(16)  # default 512 random centroids
    acc_random = top1_accuracy(random_db)
    assert acc_trained >= acc_random, (acc_trained, acc_random)
    assert acc_trained >= 0.8, f"trained-vocab top-1 {acc_trained}"
