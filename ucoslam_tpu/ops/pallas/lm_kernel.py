"""Fused motion-only LM as a single Pallas TPU kernel.

The jnp implementation (optim/pnp.py motion_only_lm, counterpart of the
reference PnPSolver::solvePnp, pnpsolver.cpp:116-409) runs rounds x iters
sequential LM steps; under XLA each step is ~40 small HLO ops, so the whole
refine is latency-bound at ~60 us/iteration (FRONTEND.md). This kernel runs
the ENTIRE rounds x iters loop — residuals, Jacobians, 6x6 normal equations,
CG solve, SE3 retraction, LM damping, Huber weights and the per-round
outlier reclassification — in one Mosaic program with everything resident
in VMEM, so the only fixed costs are one kernel launch and one (B,)-sized
input DMA.

Layout notes (TPU): per-point data is kept coordinate-major ((3, B) points,
(2, B) observations) so every per-point quantity is a (1, B) lane vector;
the normal equations H = J^T W J are built as (6, B) x (B, 6) dot_generals
that ride the MXU; all scalars live in (1, 1) arrays (Mosaic requires 2D).
The 6x6 damped system is solved with fixed-iteration CG (SPD by
construction; 8 iterations is exact-to-f32-roundoff for a 6-dim system), which
avoids an in-kernel factorization.

Semantics match motion_only_lm bit-for-bit in structure: same Huber
weighting, same lambda schedule (init 1e-3, x0.5 / x4, clipped to
[1e-8, 1e4]), same capped-cost acceptance test, same chi2(2D)=5.99 /
chi2(3D)=7.815 reclassification, same stereo disparity row
(EdgeStereoSE3ProjectXYZOnlyPose, pnpsolver.cpp:246)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _dot(a, b, dims):
    return jax.lax.dot_general(
        a, b, (dims, ((), ())), preferred_element_type=jnp.float32
    )


# Mosaic kernels may not capture array constants: identity / hat / the
# homogeneous bottom row are built from broadcasted_iota inside the kernel.
def _eye(n):
    i = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (i == j).astype(jnp.float32)


def _hat33(x, y, z):
    """hat([x,y,z]) = [[0,-z,y],[z,0,-x],[-y,x,0]] without constants."""
    i = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (3, 3), 1)

    def m(a, b):
        return ((i == a) & (j == b)).astype(jnp.float32)

    return (
        -z * m(0, 1) + y * m(0, 2) + z * m(1, 0)
        - x * m(1, 2) - y * m(2, 0) + x * m(2, 1)
    )


def _se3_exp_neg(delta):
    """exp(-delta) for delta (1, 6) = [rho, phi]; returns (4, 4)."""
    rho = -delta[:, 0:3]  # (1, 3)
    phi = -delta[:, 3:6]
    x = phi[0, 0]
    y = phi[0, 1]
    z = phi[0, 2]
    K = _hat33(x, y, z)  # (3, 3)
    KK = _dot(K, K, (([1], [0])))
    t2 = x * x + y * y + z * z
    th = jnp.sqrt(t2 + 1e-16)
    a = jnp.where(t2 < 1e-8, 1.0 - t2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(t2 < 1e-8, 0.5 - t2 / 24.0, (1.0 - jnp.cos(th)) / jnp.maximum(t2, 1e-16))
    c = jnp.where(t2 < 1e-8, 1.0 / 6.0 - t2 / 120.0, (th - jnp.sin(th)) / jnp.maximum(t2 * th, 1e-24))
    eye3 = _eye(3)
    R = eye3 + a * K + b * KK
    V = eye3 + b * K + c * KK
    t = _dot(V, rho, (([1], [1])))  # (3, 1)
    top = jnp.concatenate([R, t], axis=1)  # (3, 4)
    jj = jax.lax.broadcasted_iota(jnp.int32, (1, 4), 1)
    bottom = (jj == 3).astype(jnp.float32)
    return jnp.concatenate([top, bottom], axis=0)


def _cg6(H, g, n_iter=8):
    """Solve H x = g for SPD (6, 6) H, g (6, 1), fixed-iteration CG."""
    x = jnp.zeros((6, 1), jnp.float32)
    r = g
    p = g
    rs = jnp.sum(r * r)

    def body(i, carry):
        x, r, p, rs = carry
        Hp = _dot(H, p, (([1], [0])))  # (6, 1)
        alpha = rs / (jnp.sum(p * Hp) + 1e-30)
        x = x + alpha * p
        r = r - alpha * Hp
        rs_new = jnp.sum(r * r)
        beta = rs_new / (rs + 1e-30)
        p = r + beta * p
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, n_iter, body, (x, r, p, rs))
    return x  # (6, 1)


def _lm_kernel(
    cam_ref,  # (1, 8) SMEM: fx, fy, cx, cy, bf, 0, 0, 0
    pose_ref,  # (4, 4) VMEM
    X_ref,  # (3, B)
    uv_ref,  # (2, B)
    w_ref,  # (1, B)  1/sigma2 (0 for padding)
    valid_ref,  # (1, B) float 0/1
    depth_ref,  # (1, B)
    pose_out,  # (4, 4)
    mask_out,  # (1, B) float 0/1
    *,
    iters: int,
    rounds: int,
    has_depth: bool,
    delta2: float,
):
    fx = cam_ref[0, 0]
    fy = cam_ref[0, 1]
    cx = cam_ref[0, 2]
    cy = cam_ref[0, 3]
    bf = cam_ref[0, 4]
    X = X_ref[...]  # (3, B)
    uv_o = uv_ref[...]  # (2, B)
    w_obs = w_ref[...]  # (1, B)
    validf = valid_ref[...]
    depth = depth_ref[...]
    dmask = (depth > 0).astype(jnp.float32) if has_depth else None
    inv_d = 1.0 / jnp.maximum(depth, 1e-6)
    ur_obs = uv_o[0:1] - bf * inv_d  # (1, B) stereo observed disparity col

    def project(pose):
        """-> q (3, B), uv_hat (2, B)."""
        q = _dot(pose[:3, :3], X, (([1], [0]))) + pose[:3, 3:4]
        iz = 1.0 / jnp.maximum(q[2:3], 1e-6)
        u = fx * q[0:1] * iz + cx
        v = fy * q[1:2] * iz + cy
        return q, jnp.concatenate([u, v], axis=0), iz

    def chi2_of(pose):
        q, uv_hat, _ = project(pose)
        r = uv_hat - uv_o
        c2 = (r[0:1] * r[0:1] + r[1:2] * r[1:2]) * w_obs  # (1, B)
        if has_depth:
            ur_hat = uv_hat[0:1] - bf / jnp.maximum(q[2:3], 1e-6)
            rs = ur_hat - ur_obs
            c2 = c2 + dmask * rs * rs * w_obs
        return c2, q[2:3]

    def lm_iter(i, carry):
        pose, lam, mask = carry
        q, uv_hat, iz = project(pose)
        qx, qy, qz = q[0:1], q[1:2], q[2:3]
        ru = uv_hat[0:1] - uv_o[0:1]  # (1, B)
        rv = uv_hat[1:2] - uv_o[1:2]
        c2 = (ru * ru + rv * rv) * w_obs
        # Huber IRLS weight (optim/robust.py)
        w_hub = jnp.minimum(1.0, jnp.sqrt(delta2 / jnp.maximum(c2, 1e-12)))
        w = w_obs * w_hub * mask  # (1, B)
        a = fx * iz
        b = fy * iz
        cu = -fx * qx * iz * iz
        dv = -fy * qy * iz * iz
        # J rows wrt xi=[rho, phi] (left perturbation), (6, B) each:
        # Ju = [a, 0, cu | cu*qy, a*qz - cu*qx, -a*qy]
        # Jv = [0, b, dv | dv*qy - b*qz, -dv*qx, b*qx]
        zero = jnp.zeros_like(a)
        Ju = jnp.concatenate(
            [a, zero, cu, cu * qy, a * qz - cu * qx, -a * qy], axis=0
        )
        Jv = jnp.concatenate(
            [zero, b, dv, dv * qy - b * qz, -dv * qx, b * qx], axis=0
        )
        # ONE contraction builds H and g: Mosaic rejects both sums of dot
        # results (non-constant reduction accumulators) and lane-axis
        # concatenation of rows with different sublane offsets, so the
        # u / v (/ stereo) blocks are stacked along SUBLANES — J_all is
        # (6*nblk, B) and r_all (nblk, B) — and the per-block 6x6 / 6x1
        # pieces are sliced off the (6*nblk, 6*nblk) / (6*nblk, nblk)
        # results (the cross-blocks are computed-and-discarded; at these
        # shapes the MXU cost is negligible next to the fusion win)
        if has_depth:
            # stereo disparity row: J_s = Ju + (bf/z^2) * Jz,
            # Jz = [0, 0, 1 | qy, -qx, 0]; pre-scaling Js by the 0/1
            # depth mask folds the stereo-row weight in (dmask^2 = dmask)
            one = jnp.ones_like(a)
            Jz = jnp.concatenate([zero, zero, one, qy, -qx, zero], axis=0)
            Js = (Ju + (bf * iz * iz) * Jz) * dmask
            ur_hat = uv_hat[0:1] - bf * iz
            rs = ur_hat - ur_obs
            J_all = jnp.concatenate([Ju, Jv, Js], axis=0)  # (18, B)
            r_all = jnp.concatenate([ru, rv, rs], axis=0)  # (3, B)
        else:
            J_all = jnp.concatenate([Ju, Jv], axis=0)  # (12, B)
            r_all = jnp.concatenate([ru, rv], axis=0)  # (2, B)
        Hf = _dot(J_all * w, J_all, (([1], [1])))
        Gf = _dot(J_all * w, r_all, (([1], [1])))
        H = Hf[0:6, 0:6] + Hf[6:12, 6:12]
        g = Gf[0:6, 0:1] + Gf[6:12, 1:2]
        if has_depth:
            H = H + Hf[12:18, 12:18]
            g = g + Gf[12:18, 2:3]
        H = H + lam * _eye(6)
        delta = _cg6(H, g)  # (6, 1)
        new_pose = _dot(_se3_exp_neg(delta.reshape(1, 6)), pose, (([1], [0])))
        c2_new, _ = chi2_of(new_pose)
        c2_old, _ = chi2_of(pose)
        cap = delta2 * 4.0
        cost_new = jnp.sum(mask * jnp.minimum(c2_new, cap))
        cost_old = jnp.sum(mask * jnp.minimum(c2_old, cap))
        improved = cost_new < cost_old
        pose = jnp.where(improved, new_pose, pose)
        lam = jnp.clip(jnp.where(improved, lam * 0.5, lam * 4.0), 1e-8, 1e4)
        return pose, lam, mask

    def round_body(ri, carry):
        pose, mask = carry
        pose, _, _ = jax.lax.fori_loop(
            0, iters, lm_iter, (pose, jnp.float32(1e-3), mask)
        )
        c2, qz = chi2_of(pose)
        mask = validf * (c2 < delta2).astype(jnp.float32) * (
            qz > 0
        ).astype(jnp.float32)
        return pose, mask

    pose0 = pose_ref[...]
    pose, mask = jax.lax.fori_loop(
        0, rounds, round_body, (pose0, validf)
    )
    pose_out[...] = pose
    mask_out[...] = mask


@functools.partial(
    jax.jit, static_argnames=("iters", "rounds", "has_depth", "interpret")
)
def motion_only_lm_fused(
    pose_init: jnp.ndarray,  # (4, 4)
    pts3d: jnp.ndarray,  # (B, 3)
    uv: jnp.ndarray,  # (B, 2)
    sigma2: jnp.ndarray,  # (B,)
    valid: jnp.ndarray,  # (B,) bool
    fx,
    fy,
    cx,
    cy,
    depth: jnp.ndarray | None = None,
    bf=None,
    iters: int = 10,
    rounds: int = 4,
    has_depth: bool = False,
    interpret: bool = False,
):
    """Pallas-fused motion_only_lm. Returns (pose (4,4), inliers (B,) bool)."""
    from ucoslam_tpu.config import CHI2_2D, CHI2_3D

    B = pts3d.shape[0]
    Bp = -(-B // 128) * 128
    pad = Bp - B
    Xt = jnp.pad(pts3d, ((0, pad), (0, 0))).T  # (3, Bp)
    uvt = jnp.pad(uv, ((0, pad), (0, 0))).T  # (2, Bp)
    w = jnp.pad(1.0 / jnp.maximum(sigma2, 1e-9), (0, pad)).reshape(1, Bp)
    vf = jnp.pad(valid.astype(jnp.float32), (0, pad)).reshape(1, Bp)
    d = (
        jnp.pad(depth, (0, pad)) if depth is not None else jnp.zeros(Bp)
    ).reshape(1, Bp)
    cam_vec = jnp.stack(
        [
            jnp.float32(fx), jnp.float32(fy), jnp.float32(cx),
            jnp.float32(cy),
            jnp.float32(bf if bf is not None else 0.0),
            jnp.float32(0), jnp.float32(0), jnp.float32(0),
        ]
    ).reshape(1, 8)
    delta2 = float(CHI2_3D if has_depth else CHI2_2D)
    kernel = functools.partial(
        _lm_kernel,
        iters=iters,
        rounds=rounds,
        has_depth=has_depth,
        delta2=delta2,
    )
    pose, maskf = pl.pallas_call(
        kernel,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((4, 4), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ],
        interpret=interpret,
    )(
        cam_vec,
        pose_init.astype(jnp.float32),
        Xt.astype(jnp.float32),
        uvt.astype(jnp.float32),
        w.astype(jnp.float32),
        vf,
        d.astype(jnp.float32),
    )
    return pose, maskf[0, :B] > 0.5
