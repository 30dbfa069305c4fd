"""Batched ORB keypoint extraction (FAST + IC-angle + rotated BRIEF).

Counterpart of the reference ORBextractor (src/featureextractors/
ORBextractor.{h:85,cpp:1139-1395}): image pyramid, per-level FAST with
spatially-distributed selection (quadtree DistributeOctTree :583 becomes a
per-cell top-k), intensity-centroid orientation, Gaussian blur, 256-bit
descriptors. The reference's level-parallel thread pool
(assignLevelsToThreads :1080) disappears: every level is one fused XLA
program and all keypoints across levels are processed as one batch.

Descriptor pattern: a fixed seeded-Gaussian BRIEF pattern (sigma = patch/5,
the original BRIEF recipe) rather than OpenCV's learned table — descriptors
are NOT bit-compatible with OpenCV ORB, which is fine: the engine only ever
compares its own descriptors (SURVEY.md §7 'behavioral, not bitwise').
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ucoslam_tpu.ops.fast import fast_score_map, nms3x3, topk_grid
from ucoslam_tpu.ops.image import (
    bilinear_sample,
    build_pyramid,
    gaussian_blur,
    keypoint_moments,
)

PATCH_RADIUS = 15
EDGE_MARGIN = 19  # keypoints closer than this to a level border are dropped
N_PAIRS = 256


def _brief_pattern(seed: int = 42) -> np.ndarray:
    """(256, 2, 2) int8 sampling-pair offsets, Gaussian sigma = patch/5."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, PATCH_RADIUS / 5.0 * 2.0, size=(N_PAIRS, 2, 2))
    return np.clip(np.round(pts), -PATCH_RADIUS, PATCH_RADIUS).astype(np.float32)


BRIEF_PATTERN = _brief_pattern()


class Keypoints(NamedTuple):
    """Fixed-capacity SoA keypoint batch for one frame (level-0 pixel coords)."""

    xy: jnp.ndarray  # (N, 2) float32, raw (distorted) level-0 coords
    response: jnp.ndarray  # (N,) float32 FAST score
    octave: jnp.ndarray  # (N,) int32
    angle: jnp.ndarray  # (N,) float32 radians
    desc: jnp.ndarray  # (N, 8) uint32 packed 256-bit
    valid: jnp.ndarray  # (N,) bool

    @property
    def n(self) -> int:
        return self.xy.shape[0]


def _level_budgets(total: int, n_levels: int, scale_factor: float) -> list[int]:
    """Features per level proportional to level area (geometric decay)."""
    inv = 1.0 / scale_factor
    weights = np.array([inv ** (2 * lv) for lv in range(n_levels)])
    raw = weights / weights.sum() * total
    budgets = [max(8, int(round(r))) for r in raw]
    budgets[0] += total - sum(budgets)
    return budgets


class ORBExtractor:
    """Stateless jitted extractor; configuration fixed at construction.

    Counterpart of Feature2DSerializable::create(DESC_ORB)
    (feature2dserializable.h:66) + ORBextractor.
    """

    def __init__(
        self,
        max_features: int = 2048,
        n_levels: int = 8,
        scale_factor: float = 1.2,
        fast_threshold: float = 7.0,
        cell: int = 32,
        k_per_cell: int = 4,
    ):
        self.max_features = max_features
        self.n_levels = n_levels
        self.scale_factor = scale_factor
        self.fast_threshold = fast_threshold
        self.cell = cell
        self.k_per_cell = k_per_cell
        self.budgets = _level_budgets(max_features, n_levels, scale_factor)
        self.scales = [scale_factor ** lv for lv in range(n_levels)]
        self._jit_cache = {}

    # -- public API -----------------------------------------------------
    def detect_and_compute(self, img: jnp.ndarray) -> Keypoints:
        """img: (H, W) float32 grayscale -> Keypoints with n = max_features."""
        key = img.shape
        if key not in self._jit_cache:
            self._jit_cache[key] = jax.jit(self._detect_and_compute)
        # threshold passed as a traced value: sensitivity adaptation
        # (setSensitivity) must not trigger recompilation
        return self._jit_cache[key](img, jnp.float32(self.fast_threshold))

    def sigma2(self, octave: jnp.ndarray) -> jnp.ndarray:
        """Per-keypoint measurement variance scale^2(octave) (ref frame.h:129)."""
        log_s = jnp.log(jnp.float32(self.scale_factor))
        return jnp.exp(2.0 * octave.astype(jnp.float32) * log_s)

    # -- implementation -------------------------------------------------
    def _detect_level(self, level_img: jnp.ndarray, budget: int, threshold):
        score = fast_score_map(level_img, threshold)
        score = nms3x3(score)
        h, w = level_img.shape
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        interior = (
            (ys >= EDGE_MARGIN)
            & (ys < h - EDGE_MARGIN)
            & (xs >= EDGE_MARGIN)
            & (xs < w - EDGE_MARGIN)
        )
        score = jnp.where(interior, score, 0.0)
        xy, resp, valid = topk_grid(score, self.cell, self.k_per_cell, budget)
        return xy, resp, valid

    def _orient(self, level_img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
        m10, m01 = keypoint_moments(level_img, xy, PATCH_RADIUS)
        return jnp.arctan2(m01, m10)

    def _describe(self, blurred: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray):
        """Rotated BRIEF: sample 2x256 points per keypoint, compare, pack."""
        ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
        pat = jnp.asarray(BRIEF_PATTERN)  # (256, 2, 2) as (pair, endpoint, xy)
        px = pat[..., 0][None]  # (1, 256, 2)
        py = pat[..., 1][None]
        rx = ca[:, None, None] * px - sa[:, None, None] * py  # (N, 256, 2)
        ry = sa[:, None, None] * px + ca[:, None, None] * py
        sample_x = xy[:, None, None, 0] + rx
        sample_y = xy[:, None, None, 1] + ry
        vals = bilinear_sample(blurred, jnp.stack([sample_x, sample_y], -1))
        bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, 256)
        shifts = jnp.arange(32, dtype=jnp.uint32)
        words = bits.reshape(-1, 8, 32) << shifts[None, None, :]
        return jnp.sum(words, axis=-1, dtype=jnp.uint32)  # (N, 8)

    def _detect_and_compute(self, img: jnp.ndarray, threshold=7.0) -> Keypoints:
        levels = build_pyramid(img, self.n_levels, self.scale_factor)
        all_xy, all_resp, all_oct, all_ang, all_desc, all_valid = [], [], [], [], [], []
        for lv, level_img in enumerate(levels):
            budget = self.budgets[lv]
            xy, resp, valid = self._detect_level(level_img, budget, threshold)
            ang = self._orient(level_img, xy)
            blurred = gaussian_blur(level_img)
            desc = self._describe(blurred, xy, ang)
            all_xy.append(xy * self.scales[lv])
            all_resp.append(resp)
            all_oct.append(jnp.full((budget,), lv, jnp.int32))
            all_ang.append(ang)
            all_desc.append(desc)
            all_valid.append(valid)
        return Keypoints(
            xy=jnp.concatenate(all_xy),
            response=jnp.concatenate(all_resp),
            octave=jnp.concatenate(all_oct),
            angle=jnp.concatenate(all_ang),
            desc=jnp.concatenate(all_desc),
            valid=jnp.concatenate(all_valid),
        )
