"""Try the fused Pallas projection-match kernel on the real TPU + time it."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.ops.pallas.match_kernel import project_match_pallas
from ucoslam_tpu.ops.hamming import hamming_matrix_mxu, match_best2

P, N = 16384, 2048
rng = np.random.default_rng(0)
desc_a = jnp.asarray(rng.integers(0, 2**32, (P, 8), dtype=np.uint32))
desc_b = jnp.asarray(rng.integers(0, 2**32, (N, 8), dtype=np.uint32))
uv_a = jnp.asarray(rng.uniform(0, 640, (P, 2)).astype(np.float32))
uv_b = jnp.asarray(rng.uniform(0, 640, (N, 2)).astype(np.float32))
oct_a = jnp.asarray(rng.integers(0, 8, P).astype(np.int32))
oct_b = jnp.asarray(rng.integers(0, 8, N).astype(np.int32))
va = jnp.ones(P, bool)
vb = jnp.ones(N, bool)
r2 = jnp.full((N,), 400.0, jnp.float32)

try:
    idx, best, second = project_match_pallas(desc_a, uv_a, oct_a, va, desc_b, uv_b, oct_b, vb, r2)
    jax.block_until_ready(idx)
    t0 = time.perf_counter()
    for _ in range(20):
        idx, best, second = project_match_pallas(desc_a, uv_a, oct_a, va, desc_b, uv_b, oct_b, vb, r2)
    jax.block_until_ready(idx)
    print(f"pallas match: {(time.perf_counter() - t0) / 20 * 1e3:.3f} ms")
except Exception as e:
    print("pallas match FAILED:", type(e).__name__, str(e)[:2000])

# XLA reference for the same work
@jax.jit
def xla_match():
    d2 = jnp.sum((uv_a[:, None, :] - uv_b[None, :, :]) ** 2, -1)
    in_r = d2 < r2[None, :]
    oct_ok = jnp.abs(oct_b[None, :] - oct_a[:, None]) <= 1
    dmat = hamming_matrix_mxu(desc_a, desc_b)
    mask = in_r & oct_ok
    return match_best2(dmat, extra_mask=mask)

out = xla_match()
jax.block_until_ready(out)
t0 = time.perf_counter()
for _ in range(20):
    out = xla_match()
jax.block_until_ready(out)
print(f"xla match:    {(time.perf_counter() - t0) / 20 * 1e3:.3f} ms")
