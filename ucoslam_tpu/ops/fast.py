"""FAST-9/16 corner detection, fully vectorized over the whole image.

Counterpart of the per-level FAST loops inside the reference ORB extractor
(ORBextractor.cpp:810-1354, level-parallel thread pool :1080-1317). Instead
of scalar pixel tests, the 16 Bresenham-circle comparisons become 16 shifted
image planes and the arc test becomes log-step rolled ANDs — one fused XLA
program per level, no threads.

Score: the standard FAST "V" score — the largest threshold at which the
pixel remains a corner:
    score = max over the 16 arc phases of min over the 9 contiguous circle
    pixels of (p_i - center) for bright arcs / (center - p_i) for dark arcs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# 16 Bresenham circle offsets of radius 3, in circular order, as (dy, dx).
CIRCLE = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)
ARC_LEN = 9
BORDER = 3


def _circle_stack(img: jnp.ndarray) -> jnp.ndarray:
    """(H, W) -> (16, H, W): plane i holds the circle-i neighbour of each px.

    Border pixels read replicated padding; they are masked out by callers
    (keypoints within BORDER of the edge are never valid).
    """
    padded = jnp.pad(img, BORDER, mode="edge")
    h, w = img.shape
    planes = [
        padded[BORDER + int(dy) : BORDER + int(dy) + h,
               BORDER + int(dx) : BORDER + int(dx) + w]
        for dy, dx in CIRCLE
    ]
    return jnp.stack(planes, 0)


def _min_over_arc(vals: jnp.ndarray) -> jnp.ndarray:
    """(16, H, W) -> (16, H, W): out[i] = min(vals[i..i+8] circular).

    Log-step shrinking: min over 9 = min(min8, shift8) with min8 built from
    rolled pairwise minima (shifts 1, 2, 4).
    """
    m1 = vals
    m2 = jnp.minimum(m1, jnp.roll(m1, -1, axis=0))
    m4 = jnp.minimum(m2, jnp.roll(m2, -2, axis=0))
    m8 = jnp.minimum(m4, jnp.roll(m4, -4, axis=0))
    return jnp.minimum(m8, jnp.roll(m1, -8, axis=0))


def fast_score_map(img: jnp.ndarray, threshold: float) -> jnp.ndarray:
    """(H, W) float32 -> (H, W) float32 corner scores (0 = not a corner).

    A pixel is a corner iff some 9-long contiguous circle arc is entirely
    brighter than center+threshold or entirely darker than center-threshold.
    The returned score is the max threshold preserving cornerness.
    """
    circ = _circle_stack(img)
    center = img[None, :, :]
    bright = circ - center  # arc pixel brighter by this much
    dark = center - circ

    bright_arc = _min_over_arc(bright)  # (16, H, W): worst pixel of each arc
    dark_arc = _min_over_arc(dark)
    bright_score = jnp.max(bright_arc, axis=0)
    dark_score = jnp.max(dark_arc, axis=0)
    score = jnp.maximum(bright_score, dark_score)
    is_corner = score > threshold
    score = jnp.where(is_corner, score, 0.0)
    # Mask the border (circle reads replicated padding there).
    h, w = img.shape
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= BORDER) & (ys < h - BORDER) & (xs >= BORDER) & (xs < w - BORDER)
    return jnp.where(interior, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """3x3 non-maximum suppression; keeps strict local maxima.

    Ties resolve toward the top-left pixel (lexicographically first), making
    the result order-deterministic.
    """
    h, w = score.shape
    p = jnp.pad(score, 1, mode="constant", constant_values=-1.0)
    shifted = [
        p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
        if not (dy == 0 and dx == 0)
    ]
    neigh_max = shifted[0]
    for s in shifted[1:]:
        neigh_max = jnp.maximum(neigh_max, s)
    # strict > for later-ordered neighbours, >= for earlier => deterministic;
    # simpler equivalent: strictly greater than all neighbours OR equal to
    # max but earlier in scan order.
    greater = score > neigh_max
    # handle plateaus: equal to neighbourhood max AND no earlier neighbour equal
    earlier = [
        p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]
        for dy, dx in ((-1, -1), (-1, 0), (-1, 1), (0, -1))
    ]
    earlier_max = earlier[0]
    for s in earlier[1:]:
        earlier_max = jnp.maximum(earlier_max, s)
    plateau = (score == neigh_max) & (score > earlier_max)
    keep = greater | plateau
    return jnp.where(keep, score, 0.0)


def topk_grid(
    score: jnp.ndarray,
    cell: int,
    k_per_cell: int,
    total_k: int,
):
    """Spatially-distributed top-k keypoint selection.

    Counterpart of the reference quadtree distribution
    (ORBextractor::DistributeOctTree, ORBextractor.cpp:583): the goal is an
    even spatial spread of the strongest corners. We tile the score map into
    `cell`-sized cells, keep the `k_per_cell` best per cell, then take the
    `total_k` best overall with their (x, y) positions.

    Returns (xy (total_k, 2) float32, scores (total_k,), valid (total_k,)).
    """
    h, w = score.shape
    gh, gw = -(-h // cell), -(-w // cell)
    ph, pw = gh * cell, gw * cell
    s = jnp.pad(score, ((0, ph - h), (0, pw - w)))
    cells = s.reshape(gh, cell, gw, cell).transpose(0, 2, 1, 3).reshape(gh * gw, cell * cell)
    k_per_cell = min(k_per_cell, cell * cell)
    vals, idx = jax.lax.top_k(cells, k_per_cell)  # (C, k)
    cy = (jnp.arange(gh * gw) // gw) * cell
    cx = (jnp.arange(gh * gw) % gw) * cell
    ys = cy[:, None] + idx // cell
    xs = cx[:, None] + idx % cell
    flat_vals = vals.reshape(-1)
    flat_x = xs.reshape(-1)
    flat_y = ys.reshape(-1)
    if flat_vals.size < total_k:
        # tiny image: fewer candidate slots than requested keypoints
        pad = total_k - flat_vals.size
        flat_vals = jnp.pad(flat_vals, (0, pad))
        flat_x = jnp.pad(flat_x, (0, pad))
        flat_y = jnp.pad(flat_y, (0, pad))
    top_vals, top_i = jax.lax.top_k(flat_vals, total_k)
    xy = jnp.stack([flat_x[top_i], flat_y[top_i]], -1).astype(jnp.float32)
    valid = top_vals > 0.0
    return xy, top_vals, valid
