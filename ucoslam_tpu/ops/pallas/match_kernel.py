"""Fused projection-matching kernel: Hamming + spatial/octave gates + best-2.

The XLA path of match_points_to_frame materializes the (P, N) distance and
gate matrices in HBM (a 16k x 2k track step writes >130 MB per frame). This
kernel fuses the whole reduction: a 2-D grid of (point-tile, keypoint-tile)
programs computes each (BP, BN) distance tile on the MXU from ±1-unpacked
descriptors (popcount(a XOR b) = (256 - <a, b>)/2 for a, b in {-1,+1}^256),
applies the radius / octave / validity gates in-register on the VPU, and
folds a running (best, second, argbest) into the output block — which stays
resident in VMEM across the keypoint-tile sweep because its index map is
constant along that grid axis. Nothing but the three (P, 1) outputs and the
(P+N) x 256 bit planes ever touch HBM.

Everything is rank-2: the previous version's 3-D xor/popcount broadcast and
in-kernel fori_loop gather did not lower through Mosaic on real TPUs (it was
interpret-only); this formulation compiles and runs on the chip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ucoslam_tpu.ops.hamming import DESC_BITS, INVALID_DIST, unpack_descriptor_bits

BP = 256  # point rows per program
BN = 256  # minimum keypoint-column tile (the call picks the largest fit)


def _pick_bn(n: int) -> int:
    """Widest column tile that divides n — wider tiles stream the keypoint
    bit-planes fewer times per point tile ((BP,BN) f32 tile + (256,BN) bf16
    bits stay well under VMEM even at 2048)."""
    for bn in (2048, 1024, 512, 256):
        if n % bn == 0:
            return bn
    raise ValueError(f"N={n} not a multiple of {BN}")


def _match_kernel(
    bits_a_ref,  # (BP, 256) bf16 ±1 point descriptor bits
    meta_a_ref,  # (BP, 8) f32 rows: [u, v, octave, valid, 0...]
    bits_bT_ref,  # (256, BN) bf16 ±1 keypoint bits, transposed
    meta_bT_ref,  # (8, BN) f32 rows: [u, v, octave, valid, radius2, 0...]
    best_ref,  # (BP, 1) i32 out (accumulated over keypoint tiles)
    second_ref,  # (BP, 1) i32 out
    idx_ref,  # (BP, 1) i32 out
):
    j = pl.program_id(1)
    bn = bits_bT_ref.shape[1]
    dot = jnp.dot(
        bits_a_ref[:], bits_bT_ref[:], preferred_element_type=jnp.float32,
        # explicit: the engine-wide f32-highest default (utils/precision)
        # must not reach this bf16 bit-matmul — Mosaic rejects fp32
        # contract precision on bf16 operands, and ±1 dots in [-256, 256]
        # are exact at native bf16 anyway
        precision=jax.lax.Precision.DEFAULT,
    )  # (BP, BN)
    d = (DESC_BITS - dot) * 0.5
    du = meta_a_ref[:, 0:1] - meta_bT_ref[0:1, :]
    dv = meta_a_ref[:, 1:2] - meta_bT_ref[1:2, :]
    r2 = du * du + dv * dv
    ok = (
        (r2 < meta_bT_ref[4:5, :])
        & (jnp.abs(meta_a_ref[:, 2:3] - meta_bT_ref[2:3, :]) <= 1.0)
        & (meta_a_ref[:, 3:4] > 0.0)
        & (meta_bT_ref[3:4, :] > 0.0)
    )
    d = jnp.where(ok, d, float(INVALID_DIST))

    # tile best + second (second = runner-up at a different column)
    t1 = jnp.min(d, axis=1, keepdims=True)
    cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
    t1_col = jnp.min(jnp.where(d == t1, cols, d.shape[1]), axis=1, keepdims=True)
    t2 = jnp.min(
        jnp.where(cols == t1_col, float(INVALID_DIST), d), axis=1, keepdims=True
    )
    t1_i = t1.astype(jnp.int32)
    t2_i = t2.astype(jnp.int32)
    t1_idx = t1_col + j * bn

    @pl.when(j == 0)
    def _():
        best_ref[:] = t1_i
        second_ref[:] = t2_i
        idx_ref[:] = jnp.where(t1_i < INVALID_DIST, t1_idx, -1)

    @pl.when(j > 0)
    def _():
        best = best_ref[:]
        second = second_ref[:]
        bidx = idx_ref[:]
        best_ref[:] = jnp.minimum(best, t1_i)
        second_ref[:] = jnp.minimum(
            jnp.maximum(best, t1_i), jnp.minimum(second, t2_i)
        )
        idx_ref[:] = jnp.where(t1_i < best, t1_idx, bidx)


@partial(jax.jit, static_argnames=("interpret",))
def project_match_pallas(
    desc_a: jnp.ndarray,  # (P, 8) uint32
    uv_a: jnp.ndarray,  # (P, 2) projected pixel positions
    oct_a: jnp.ndarray,  # (P,) int32 predicted octave
    valid_a: jnp.ndarray,  # (P,) bool
    desc_b: jnp.ndarray,  # (N, 8) uint32
    uv_b: jnp.ndarray,  # (N, 2)
    oct_b: jnp.ndarray,  # (N,) int32
    valid_b: jnp.ndarray,  # (N,) bool
    radius2: jnp.ndarray,  # (N,) squared search radius per keypoint
    interpret: bool = False,
):
    """-> (best_idx (P,), best (P,), second (P,)) with INVALID_DIST padding.

    best_idx is -1 for rows with no gated candidate. P must be a multiple
    of BP and N a multiple of BN (pad + mask upstream).
    """
    P = desc_a.shape[0]
    N = desc_b.shape[0]
    assert P % BP == 0 and N % BN == 0, (P, N)
    bn = _pick_bn(N)

    bits_a = unpack_descriptor_bits(desc_a)  # (P, 256) bf16
    bits_bT = unpack_descriptor_bits(desc_b).T  # (256, N)
    meta_a = jnp.stack(
        [
            uv_a[:, 0],
            uv_a[:, 1],
            oct_a.astype(jnp.float32),
            valid_a.astype(jnp.float32),
        ]
        + [jnp.zeros((P,), jnp.float32)] * 4,
        axis=1,
    )  # (P, 8)
    meta_bT = jnp.stack(
        [
            uv_b[:, 0],
            uv_b[:, 1],
            oct_b.astype(jnp.float32),
            valid_b.astype(jnp.float32),
            radius2.astype(jnp.float32),
        ]
        + [jnp.zeros((N,), jnp.float32)] * 3,
        axis=0,
    )  # (8, N)

    grid = (P // BP, N // bn)
    out_spec = pl.BlockSpec((BP, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM)
    best, second, idx = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BP, DESC_BITS), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BP, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((DESC_BITS, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, bn), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[out_spec, out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
        ],
        interpret=interpret,
    )(bits_a, meta_a, bits_bT, meta_bT)
    return idx[:, 0], best[:, 0], second[:, 0]
