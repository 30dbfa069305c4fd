"""Fused projection-matching kernel: Hamming + spatial/octave gates + best-2.

The XLA path of match_points_to_frame materializes the (P, N) distance and
gate matrices in HBM (a 16k x 2k track step writes >130 MB per frame). This
kernel fuses the whole reduction: for each map-point row it streams the
frame's keypoint columns through VMEM in 128-wide tiles, computes Hamming
distance from the packed uint32 descriptors, applies the radius / octave /
validity gates in-register, and maintains (best, second, argbest) scratch —
nothing but the three (P,) outputs ever leaves the chip.

Grid: (P / BP,) programs; each iterates the N columns with a fori_loop.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ucoslam_tpu.ops.hamming import INVALID_DIST

BP = 256  # point rows per program
BN = 128  # keypoint columns per inner step


def _match_kernel(
    desc_a_ref,  # (BP, 8) uint32
    uv_a_ref,  # (BP, 2) float32 projected positions
    oct_a_ref,  # (BP, 1) int32 predicted octave
    valid_a_ref,  # (BP, 1) int32
    desc_b_ref,  # (N, 8) uint32 (whole frame resident in VMEM)
    uv_b_ref,  # (N, 2)
    oct_b_ref,  # (N, 1)
    valid_b_ref,  # (N, 1)
    radius2_ref,  # (N, 1) float32 squared search radius per keypoint
    best_ref,  # (BP, 1) int32 out
    second_ref,  # (BP, 1) int32 out
    idx_ref,  # (BP, 1) int32 out
):
    n = desc_b_ref.shape[0]
    n_steps = n // BN

    desc_a = desc_a_ref[:]  # (BP, 8)
    uv_a = uv_a_ref[:]
    oct_a = oct_a_ref[:]  # (BP, 1)
    valid_a = valid_a_ref[:] > 0

    def step(j, carry):
        best, second, bidx = carry
        sl = pl.ds(j * BN, BN)
        db = desc_b_ref[sl, :]  # (BN, 8)
        # Hamming: sum of popcounts over the 8 words
        x = jnp.bitwise_xor(desc_a[:, None, :], db[None, :, :])  # (BP, BN, 8)
        d = jnp.sum(
            jax.lax.population_count(x).astype(jnp.int32), axis=-1
        )  # (BP, BN)
        # gates
        uv_b = uv_b_ref[sl, :]
        du = uv_a[:, 0:1] - uv_b[None, :, 0]  # (BP, BN)
        dv = uv_a[:, 1:2] - uv_b[None, :, 1]
        r2 = du * du + dv * dv
        in_r = r2 < radius2_ref[sl, 0][None, :]
        oct_ok = jnp.abs(oct_a - oct_b_ref[sl, 0][None, :]) <= 1
        ok = in_r & oct_ok & valid_a & (valid_b_ref[sl, 0][None, :] > 0)
        d = jnp.where(ok, d, INVALID_DIST)
        # tile best + second
        t1 = jnp.min(d, axis=1, keepdims=True)  # (BP, 1)
        cols = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)
        is_min = d == t1
        t1_idx = jnp.min(jnp.where(is_min, cols, n), axis=1, keepdims=True) + j * BN
        d2 = jnp.where(is_min & (cols == (t1_idx - j * BN)), INVALID_DIST, d)
        t2 = jnp.min(d2, axis=1, keepdims=True)
        # merge with running best/second
        new_best = jnp.minimum(best, t1)
        new_second = jnp.minimum(jnp.maximum(best, t1), jnp.minimum(second, t2))
        new_idx = jnp.where(t1 < best, t1_idx, bidx)
        return new_best, new_second, new_idx

    init = (
        jnp.full((BP, 1), INVALID_DIST, jnp.int32),
        jnp.full((BP, 1), INVALID_DIST, jnp.int32),
        jnp.full((BP, 1), -1, jnp.int32),
    )
    best, second, bidx = jax.lax.fori_loop(0, n_steps, step, init)
    best_ref[:] = best
    second_ref[:] = second
    idx_ref[:] = bidx


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

    P must be a multiple of BP and N a multiple of BN (pad + mask upstream).
    """
    P = desc_a.shape[0]
    N = desc_b.shape[0]
    assert P % BP == 0 and N % BN == 0, (P, N)
    grid = (P // BP,)

    def row_spec(width, dtype=None):
        return pl.BlockSpec((BP, width), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def col_spec(width):
        return pl.BlockSpec((N, width), lambda i: (0, 0), memory_space=pltpu.VMEM)

    best, second, idx = pl.pallas_call(
        _match_kernel,
        grid=grid,
        in_specs=[
            row_spec(8),
            row_spec(2),
            row_spec(1),
            row_spec(1),
            col_spec(8),
            col_spec(2),
            col_spec(1),
            col_spec(1),
            col_spec(1),
        ],
        out_specs=[row_spec(1), row_spec(1), row_spec(1)],
        out_shape=[
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
            jax.ShapeDtypeStruct((P, 1), jnp.int32),
        ],
        interpret=interpret,
    )(
        desc_a,
        uv_a,
        oct_a.astype(jnp.int32)[:, None],
        valid_a.astype(jnp.int32)[:, None],
        desc_b,
        uv_b,
        oct_b.astype(jnp.int32)[:, None],
        valid_b.astype(jnp.int32)[:, None],
        radius2[:, None].astype(jnp.float32),
    )
    return idx[:, 0], best[:, 0], second[:, 0]
