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
def bow_vector(desc: jnp.ndarray, valid: jnp.ndarray, vocab: jnp.ndarray) -> jnp.ndarray:
    """Descriptor set -> L2-normalized word histogram (V,).

    Counterpart of fbow::Vocabulary::transform (fbow.h:91): one Hamming
    argmin per descriptor against the flat vocabulary.
    """
    from ucoslam_tpu.ops.hamming import hamming_matrix

    d = hamming_matrix(desc, vocab)  # (N, V)
    word = jnp.argmin(d, axis=1)
    V = vocab.shape[0]
    hist = jnp.zeros((V,), jnp.float32).at[word].add(valid.astype(jnp.float32))
    norm = jnp.linalg.norm(hist).clip(1e-9)
    return hist / norm


@jax.jit
def bow_scores(query: jnp.ndarray, database: jnp.ndarray) -> jnp.ndarray:
    """(V,) x (K, V) -> (K,) cosine similarity (fbow L2 score, fbow.h:33)."""
    return database @ query


class KeyFrameDataBase:
    """Per-keyframe BoW vectors, kept alongside the Map arenas."""

    def __init__(self, max_keyframes: int, vocab: jnp.ndarray | None = None):
        self.vocab = vocab if vocab is not None else make_vocabulary()
        self.vectors = jnp.zeros((max_keyframes, self.vocab.shape[0]), jnp.float32)

    def add(self, kf_slot: int, desc: jnp.ndarray, valid: jnp.ndarray) -> None:
        vec = bow_vector(desc, valid, self.vocab)
        self.vectors = self.vectors.at[kf_slot].set(vec)

    def remove(self, kf_slots) -> None:
        self.vectors = self.vectors.at[jnp.asarray(kf_slots)].set(0.0)

    def query(self, desc: jnp.ndarray, valid: jnp.ndarray) -> np.ndarray:
        """(K,) similarity of every keyframe slot to the given frame."""
        vec = bow_vector(desc, valid, self.vocab)
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
