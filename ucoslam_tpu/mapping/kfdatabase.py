"""Keyframe database: bag-of-binary-words relocalization/loop candidates.

Counterpart of the reference KeyFrameDataBase (keyframedatabase.{h:32,cpp:15-
369}) + fbow (3rdparty/fbow): a vocabulary transform maps a frame's
descriptor set to a sparse word histogram; candidate keyframes score by
histogram similarity, gated against covisibility-neighbour scores.

TPU-native design: the hierarchical AVX k-means tree collapses into ONE
batched Hamming argmin against a flat vocabulary of binary centroids
(a dense (N, V) distance matrix on the MXU) — the tree exists only to make
CPUs fast. The vocabulary is deterministic (seeded), so no .fbow file is
required; a loader hook can replace it with a trained vocabulary later.
A DummyDataBase equivalent (vocab=None) disables reloc/loop-by-keypoints,
matching the reference's behavior without a vocabulary (ucoslam.h:41).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

VOCAB_SIZE = 512


def make_vocabulary(size: int = VOCAB_SIZE, seed: int = 1234) -> jnp.ndarray:
    """(V, 8) uint32 random binary centroids (deterministic)."""
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.integers(0, 2**32, (size, 8), dtype=np.uint32))


@jax.jit
def bow_vector(
    desc: jnp.ndarray,
    valid: jnp.ndarray,
    vocab: jnp.ndarray,
    weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Descriptor set -> L2-normalized word histogram (V,).

    Counterpart of fbow::Vocabulary::transform (fbow.h:91): one Hamming
    argmin per descriptor against the flat vocabulary, accumulating the
    word's weight (fbow adds the leaf weight per hit, fbow.h:390). Large
    vocabularies quantize in chunks so the (N, V) distance matrix never
    materializes whole.
    """
    from ucoslam_tpu.ops.hamming import hamming_matrix

    V = vocab.shape[0]
    if V <= 8192:
        d = hamming_matrix(desc, vocab)  # (N, V)
        word = jnp.argmin(d, axis=1)
    else:
        C = 4096
        pad = (-V) % C
        vpad = jnp.concatenate(
            [vocab, jnp.zeros((pad, vocab.shape[1]), vocab.dtype)]
        ).reshape(-1, C, vocab.shape[1])

        def chunk(carry, vc_i):
            best_d, best_i, base = carry
            d = hamming_matrix(desc, vc_i)  # (N, C)
            # mask padded vocabulary rows out of the argmin
            col_ok = base + jnp.arange(C, dtype=jnp.int32) < V
            d = jnp.where(col_ok[None, :], d, 2**30)
            i = jnp.argmin(d, axis=1)
            dm = jnp.take_along_axis(d, i[:, None], 1)[:, 0]
            upd = dm < best_d
            return (
                jnp.where(upd, dm, best_d),
                jnp.where(upd, base + i.astype(jnp.int32), best_i),
                base + C,
            ), None

        (best_d, word, _), _ = jax.lax.scan(
            chunk,
            (
                jnp.full((desc.shape[0],), 2**31 - 1, jnp.int32),
                jnp.zeros((desc.shape[0],), jnp.int32),
                jnp.int32(0),
            ),
            vpad,
        )
        word = jnp.minimum(word, V - 1)  # padded rows can't win (dist huge)
    w = jnp.ones((V,), jnp.float32) if weights is None else weights
    hist = jnp.zeros((V,), jnp.float32).at[word].add(
        valid.astype(jnp.float32) * w[word]
    )
    norm = jnp.linalg.norm(hist).clip(1e-9)
    return hist / norm


@jax.jit
def bow_scores(query: jnp.ndarray, database: jnp.ndarray) -> jnp.ndarray:
    """(V,) x (K, V) -> (K,) cosine similarity (fbow L2 score, fbow.h:33)."""
    return database @ query


class KeyFrameDataBase:
    """Per-keyframe BoW vectors, kept alongside the Map arenas."""

    def __init__(
        self,
        max_keyframes: int,
        vocab: jnp.ndarray | None = None,
        weights: jnp.ndarray | None = None,
    ):
        self.vocab = vocab if vocab is not None else make_vocabulary()
        self.weights = weights  # (V,) word weights or None (uniform)
        self.vectors = jnp.zeros((max_keyframes, self.vocab.shape[0]), jnp.float32)

    def load_vocabulary(self, path: str) -> None:
        """Replace the vocabulary with a .fbow file's flattened leaf set
        (counterpart Vocabulary::readFromFile, fbow.h:97; wired through
        UcoSlam::setParams' vocabulary argument, ucoslam.cpp:11)."""
        from ucoslam_tpu.io.fbow import load_fbow

        v = load_fbow(path)
        self.vocab = jnp.asarray(v.desc)
        self.weights = jnp.asarray(v.weight)
        self.vectors = jnp.zeros(
            (self.vectors.shape[0], self.vocab.shape[0]), jnp.float32
        )

    def add(self, kf_slot: int, desc: jnp.ndarray, valid: jnp.ndarray) -> None:
        vec = bow_vector(desc, valid, self.vocab, self.weights)
        self.vectors = self.vectors.at[kf_slot].set(vec)

    def remove(self, kf_slots) -> None:
        self.vectors = self.vectors.at[jnp.asarray(kf_slots)].set(0.0)

    def query(self, desc: jnp.ndarray, valid: jnp.ndarray) -> np.ndarray:
        """(K,) similarity of every keyframe slot to the given frame."""
        vec = bow_vector(desc, valid, self.vocab, self.weights)
        return np.asarray(bow_scores(vec, self.vectors))

    def relocalization_candidates(
        self,
        desc: jnp.ndarray,
        valid: jnp.ndarray,
        kf_active: np.ndarray,
        exclude: set[int] = frozenset(),
        min_score_ratio: float = 0.75,
        max_candidates: int = 5,
    ) -> list[int]:
        """Candidate keyframes scoring >= ratio * best (keyframedatabase.cpp:195)."""
        scores = self.query(desc, valid)
        scores = np.where(kf_active, scores, -1.0)
        for e in exclude:
            scores[e] = -1.0
        best = scores.max()
        if best <= 0:
            return []
        cand = np.nonzero(scores >= min_score_ratio * best)[0]
        cand = cand[np.argsort(-scores[cand])]
        return [int(c) for c in cand[:max_candidates]]
