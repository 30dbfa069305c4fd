import time
import jax
import jax.numpy as jnp

from ucoslam_tpu.features.orb import ORBExtractor
from ucoslam_tpu.io.synthetic import SyntheticSequence
from ucoslam_tpu.ops.image import build_pyramid
from ucoslam_tpu.ops.fast import fast_score_map, nms3x3

seq = SyntheticSequence(n_frames=4, n_points=1500)
img = jnp.asarray(seq.render(0))
orb = ORBExtractor(max_features=2048, n_levels=8)
thr = jnp.float32(7.0)


def bench(name, fn, *args, reps=50):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    dt = (time.perf_counter() - t0) / reps * 1e3
    print(f"{name:32s} {dt:7.3f} ms")


@jax.jit
def v1(im):
    return [l.sum() for l in build_pyramid(im, 8, 1.2)]


@jax.jit
def v2(im, t):
    return [nms3x3(fast_score_map(l, t)).sum() for l in build_pyramid(im, 8, 1.2)]


@jax.jit
def v3(im, t):
    levels = build_pyramid(im, 8, 1.2)
    out = []
    for lv, li in enumerate(levels):
        xy, r, v = orb._detect_level(li, orb.budgets[lv], t)
        out.append(xy.sum() + r.sum())
    return out


@jax.jit
def v4(im, t):
    levels = build_pyramid(im, 8, 1.2)
    out = []
    for lv, li in enumerate(levels):
        xy, r, v = orb._detect_level(li, orb.budgets[lv], t)
        out.append(orb._extract_support_patches(li, xy).sum())
    return out


bench("v1 pyramid", v1, img)
bench("v2 +fast+nms", v2, img, thr)
bench("v3 +topk", v3, img, thr)
bench("v4 +patches", v4, img, thr)
bench("v5 full", orb.detect_and_compute, img)
