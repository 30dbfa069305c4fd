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
def quantize_words(desc: jnp.ndarray, vocab: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) descriptors -> (N,) nearest vocabulary word ids.

    The fbow transform's second output fBow2 maps words to the feature
    indices quantized to them (fbow.h:91-93); here the per-descriptor word
    id IS that association — word-aligned matching masks pairs by word
    equality instead of walking per-word lists.
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
    return word


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
    V = vocab.shape[0]
    word = quantize_words(desc, vocab)
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


@jax.jit
def bow_common_words(query: jnp.ndarray, database: jnp.ndarray) -> jnp.ndarray:
    """(V,) x (K, V) -> (K,) count of vocabulary words present in both.

    Counterpart of the reference's inverted-index shared-word counting
    (KPFrameDataBase::relocalizationCandidates, keyframedatabase.cpp:195-
    250): instead of walking word->frame lists, one masked matmul over the
    dense histograms counts the intersection for every keyframe at once.
    """
    q = (query > 0).astype(jnp.bfloat16)
    db = (database > 0).astype(jnp.bfloat16)
    return jnp.dot(db, q, preferred_element_type=jnp.float32).astype(jnp.int32)


class KeyFrameDataBase:
    """Per-keyframe BoW vectors, kept alongside the Map arenas.

    `dummy=True` reproduces the reference's DummyDataBase
    (keyframedatabase.cpp:98): no vocabulary — add/query are no-ops and no
    candidates are ever returned, so BoW reloc/loop detection quietly
    disable while everything else keeps running (ucoslam.h:41).
    """

    def __init__(
        self,
        max_keyframes: int,
        vocab: jnp.ndarray | None = None,
        weights: jnp.ndarray | None = None,
        dummy: bool = False,
    ):
        self.dummy = dummy
        self.vocab = vocab if vocab is not None else make_vocabulary()
        self.weights = weights  # (V,) word weights or None (uniform)
        self.vectors = jnp.zeros((max_keyframes, self.vocab.shape[0]), jnp.float32)

    def load_vocabulary(self, path: str) -> None:
        """Replace the vocabulary with a .fbow file's flattened leaf set
        (counterpart Vocabulary::readFromFile, fbow.h:97; wired through
        UcoSlam::setParams' vocabulary argument, ucoslam.cpp:11)."""
        from ucoslam_tpu.io.fbow import load_fbow

        v = load_fbow(path)
        self.dummy = False  # a real vocabulary upgrades a DummyDataBase
        self.vocab = jnp.asarray(v.desc)
        self.weights = jnp.asarray(v.weight)
        self.vectors = jnp.zeros(
            (self.vectors.shape[0], self.vocab.shape[0]), jnp.float32
        )

    def grow(self, new_max_keyframes: int) -> None:
        """Extend the per-keyframe vector table (keyframe arena growth)."""
        K = self.vectors.shape[0]
        if new_max_keyframes > K:
            self.vectors = jnp.concatenate(
                [
                    self.vectors,
                    jnp.zeros(
                        (new_max_keyframes - K, self.vectors.shape[1]), jnp.float32
                    ),
                ]
            )

    def add(self, kf_slot: int, desc: jnp.ndarray, valid: jnp.ndarray) -> None:
        if self.dummy:
            return
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
        covis: np.ndarray | None = None,
        exclude: set[int] = frozenset(),
        min_score_ratio: float = 0.75,
        max_candidates: int = 5,
        min_common_ratio: float = 0.8,
    ) -> list[int]:
        """Candidate keyframes for relocalization / loop detection.

        Reference protocol (KPFrameDataBase::relocalizationCandidates,
        keyframedatabase.cpp:195-304): (1) gate by shared vocabulary words
        >= 0.8 x the best shared-word count; (2) score survivors by BoW
        similarity; (3) when `covis` (the (K, K) covisibility matrix) is
        given, accumulate each survivor's score with its top-10 covisible
        survivors and return the best-scoring member of every group whose
        accumulated score >= 0.75 x the best group — covisibility grouping
        stops near-identical neighbours from crowding out distinct places.
        """
        if self.dummy:
            return []
        vec = bow_vector(desc, valid, self.vocab, self.weights)
        scores = np.asarray(bow_scores(vec, self.vectors))
        common = np.asarray(bow_common_words(vec, self.vectors))
        ok = np.asarray(kf_active, bool).copy()
        if exclude:
            ok[np.fromiter(exclude, int)] = False
        ok &= scores > 0
        if not ok.any():
            return []
        max_common = common[ok].max()
        ok &= common >= max(min_common_ratio * max_common, 1.0)
        if not ok.any():
            return []
        cand = np.nonzero(ok)[0]
        if covis is None:
            best = scores[cand].max()
            cand = cand[scores[cand] >= min_score_ratio * best]
            cand = cand[np.argsort(-scores[cand])]
            return [int(c) for c in cand[:max_candidates]]
        # covisibility grouping (keyframedatabase.cpp:250-304)
        acc = np.zeros(len(cand))
        best_of = np.zeros(len(cand), int)
        for j, i in enumerate(cand):
            w = covis[i].copy()
            w[~ok] = 0
            nb = np.argsort(-w)[:10]
            group = np.concatenate([[i], nb[w[nb] > 0]])
            acc[j] = scores[group].sum()
            best_of[j] = int(group[np.argmax(scores[group])])
        best_acc = acc.max()
        out: list[int] = []
        for j in np.argsort(-acc):
            if acc[j] < min_score_ratio * best_acc:
                break
            if best_of[j] not in out:
                out.append(int(best_of[j]))
        return out[:max_candidates]
