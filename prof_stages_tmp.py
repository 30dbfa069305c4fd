"""Per-stage timing of the two bench hot paths on the real TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.features.orb import ORBExtractor
from ucoslam_tpu.io.synthetic import SyntheticSequence
from ucoslam_tpu.ops.fast import fast_score_map, nms3x3, topk_grid
from ucoslam_tpu.ops.image import build_pyramid


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3


seq = SyntheticSequence(n_frames=4, n_points=1500)
img = jnp.asarray(seq.render(0))
orb = ORBExtractor(max_features=2048, n_levels=8)

# full
t_full = timeit(orb.detect_and_compute, img); print(f"extract full {t_full:8.3f} ms", flush=True)

# pyramid only
pyr = jax.jit(lambda im: build_pyramid(im, 8, 1.2))
t_pyr = timeit(pyr, img); print(f"pyramid {t_pyr:8.3f} ms", flush=True)

# detect per level (score+nms+topk) on all levels
def detect_all(im, thr):
    levels = build_pyramid(im, 8, 1.2)
    outs = []
    for lv, li in enumerate(levels):
        outs.append(orb._detect_level(li, orb.budgets[lv], thr))
    return outs
t_detect = timeit(jax.jit(detect_all), img, jnp.float32(7.0)); print(f"+detect {t_detect:8.3f} ms", flush=True)

# detect + patches (no describe)
def detect_patches(im, thr):
    levels = build_pyramid(im, 8, 1.2)
    outs = []
    for lv, li in enumerate(levels):
        xy, r, v = orb._detect_level(li, orb.budgets[lv], thr)
        outs.append(orb._extract_support_patches(li, xy))
    return outs
t_patches = timeit(jax.jit(detect_patches), img, jnp.float32(7.0)); print(f"+patches {t_patches:8.3f} ms", flush=True)

# describe alone on a fixed patch batch
patches = jnp.concatenate(jax.jit(detect_patches)(img, jnp.float32(7.0)))
t_describe = timeit(jax.jit(orb._orient_and_describe), patches); print(f"describe {t_describe:8.3f} ms", flush=True)

import sys
print(f"extract full      {t_full:8.3f} ms")
print(f"  pyramid         {t_pyr:8.3f} ms")
print(f"  +detect         {t_detect:8.3f} ms")
print(f"  +patches        {t_patches:8.3f} ms")
print(f"  describe(batch) {t_describe:8.3f} ms  (patches {patches.shape})")

# ---------------- tracking ----------------
from ucoslam_tpu.config import Params
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.mapping.frame import empty_frame
from ucoslam_tpu.mapping.map import Map
from ucoslam_tpu.slam.tracker import _track_step
from ucoslam_tpu.matching.projection import match_points_to_frame
from ucoslam_tpu.optim.pnp import motion_only_lm

rng = np.random.default_rng(0)
P, N = 16384, 2048
params = Params().replace(maxMapPoints=P, maxKeyFrames=64, maxKeyPointsPerFrame=N)
cam = CameraParams.create(500.0, 500.0, 320.0, 240.0)
X = rng.uniform(-3, 3, (P, 3)).astype(np.float32)
X[:, 2] = rng.uniform(3, 10, P)
desc = rng.integers(0, 2**32, (P, 8), dtype=np.uint32)
dist = np.linalg.norm(X, axis=1)
m = Map(params)
m.add_points(X, X / dist[:, None], desc, dist / 1.2**7, dist * 1.05,
             np.zeros(P, np.int32), 0)
uv = np.asarray(cam.project(jnp.asarray(X)))[:N] + rng.normal(0, 0.3, (N, 2))
frame = empty_frame(N)._replace(
    und_xy=jnp.asarray(uv.astype(np.float32)),
    desc=jnp.asarray(desc[:N]),
    valid=jnp.ones(N, bool),
)
st = m.state
args = (st, frame, cam, jnp.eye(4), jnp.float32(15.0), jnp.float32(60.0), jnp.float32(1.2))
t_track = timeit(lambda: _track_step(*args), n=20); print(f"track full {t_track:8.3f} ms", flush=True)

t_match = timeit(jax.jit(lambda: match_points_to_frame(
    st.pt_pos, st.pt_desc, st.pt_normal, st.pt_min_dist, st.pt_max_dist,
    st.pt_active, frame, cam, jnp.eye(4), jnp.float32(15.0), jnp.float32(60.0),
    jnp.float32(1.2))), n=20); print(f"proj match {t_match:8.3f} ms", flush=True)

Xo = st.pt_pos[:N]
sigma2 = jnp.ones(N)
ov = jnp.ones(N, bool)
t_lm = timeit(jax.jit(lambda: motion_only_lm(
    jnp.eye(4), Xo, frame.und_xy, sigma2, ov, cam, iters=10, rounds=4)), n=20); print(f"motion LM {t_lm:8.3f} ms", flush=True)

print(f"track full        {t_track:8.3f} ms")
print(f"  proj match      {t_match:8.3f} ms")
print(f"  motion LM       {t_lm:8.3f} ms")
