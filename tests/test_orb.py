"""ORB extractor behavior tests: detection, repeatability, descriptor matching."""

import numpy as np
import jax.numpy as jnp
import pytest

from ucoslam_tpu.features import ORBExtractor
from ucoslam_tpu.ops import hamming_matrix, match_best2

RNG = np.random.default_rng(11)


def synthetic_texture(h=240, w=320, n_blobs=120, seed=3):
    """Random blob texture with plenty of corners."""
    rng = np.random.default_rng(seed)
    img = np.full((h, w), 64.0, np.float32)
    for _ in range(n_blobs):
        y, x = rng.integers(10, h - 20), rng.integers(10, w - 20)
        bh, bw = rng.integers(4, 16, 2)
        img[y : y + bh, x : x + bw] = rng.uniform(0, 255)
    return img


@pytest.fixture(scope="module")
def orb():
    return ORBExtractor(max_features=512, n_levels=4)


@pytest.fixture(scope="module")
def img():
    return synthetic_texture()


def test_detects_features(orb, img):
    kps = orb.detect_and_compute(jnp.asarray(img))
    v = np.asarray(kps.valid)
    assert v.sum() > 200
    xy = np.asarray(kps.xy)[v]
    assert (xy[:, 0] >= 0).all() and (xy[:, 0] < 320).all()
    # features on several octaves
    assert len(np.unique(np.asarray(kps.octave)[v])) >= 2


def test_translation_repeatability(orb, img):
    """Shifted image -> descriptors should match back at the shifted position."""
    shift = 8
    img2 = np.roll(img, shift, axis=1)
    k1 = orb.detect_and_compute(jnp.asarray(img))
    k2 = orb.detect_and_compute(jnp.asarray(img2))
    d = hamming_matrix(k1.desc, k2.desc)
    idx, best, second = match_best2(d, valid_rows=k1.valid, valid_cols=k2.valid)
    good = (np.asarray(best) < 50) & (np.asarray(best) < 0.8 * np.asarray(second))
    x1 = np.asarray(k1.xy)
    x2 = np.asarray(k2.xy)[np.asarray(idx)]
    dx = x2[:, 0] - x1[:, 0]
    dy = x2[:, 1] - x1[:, 1]
    inlier = good & (np.abs(dx - shift) < 2.0) & (np.abs(dy) < 2.0)
    assert inlier.sum() > 50
    assert inlier.sum() / max(good.sum(), 1) > 0.7


def test_rotation_invariance(orb):
    """rBRIEF match-RATE gate across +/-30 deg in-plane rotation: the
    steered descriptors must re-match a rotated view of the same texture
    at a healthy rate, not just produce a handful of survivors."""
    cv2 = pytest.importorskip("cv2")
    img = synthetic_texture(256, 256, seed=5)
    k1 = orb.detect_and_compute(jnp.asarray(img))
    x1 = np.asarray(k1.xy)
    central = (np.linalg.norm(x1 - 128.0, axis=1) < 90) & np.asarray(k1.valid)
    for angle in (30.0, -30.0):
        M = cv2.getRotationMatrix2D((128, 128), angle, 1.0)
        img2 = cv2.warpAffine(img, M, (256, 256))
        k2 = orb.detect_and_compute(jnp.asarray(img2))
        d = hamming_matrix(k1.desc, k2.desc)
        idx, best, second = match_best2(d, valid_rows=k1.valid, valid_cols=k2.valid)
        good = (np.asarray(best) < 60) & (
            np.asarray(best) < 0.8 * np.asarray(second)
        )
        # matched position must agree with the ground-truth rotation
        x2 = np.asarray(k2.xy)[np.asarray(idx)]
        x1h = np.concatenate([x1, np.ones((len(x1), 1))], 1)
        err = np.linalg.norm(x1h @ M.T - x2, axis=1)
        inlier = good & (err < 3.0)
        rate = inlier[central].sum() / max(central.sum(), 1)
        assert rate > 0.25, f"rotation {angle}: match rate {rate:.3f}"


def test_determinism(orb, img):
    k1 = orb.detect_and_compute(jnp.asarray(img))
    k2 = orb.detect_and_compute(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(k1.xy), np.asarray(k2.xy))
    np.testing.assert_array_equal(np.asarray(k1.desc), np.asarray(k2.desc))


def test_sigma2(orb):
    s2 = np.asarray(orb.sigma2(jnp.asarray([0, 1, 2])))
    np.testing.assert_allclose(s2, [1.0, 1.44, 1.44**2], rtol=1e-5)


def test_kpt_image_scale_factor_coords_fullres():
    """kptImageScaleFactor (ucoslamtypes.h:131): detection at reduced
    resolution, keypoint coordinates reported at full resolution."""
    from ucoslam_tpu.config import Params
    from ucoslam_tpu.features.frame_extractor import FrameExtractor
    from ucoslam_tpu.geometry.camera import CameraParams

    rng = np.random.default_rng(5)
    H, W = 240, 320
    img = (rng.uniform(0, 255, (H, W)) * (rng.random((H, W)) > 0.7)).astype(np.uint8)
    cam = CameraParams.create(300.0, 300.0, W / 2, H / 2, width=W, height=H)
    fx_full = FrameExtractor(Params().replace(detectMarkers=False), cam)
    fx_half = FrameExtractor(
        Params().replace(detectMarkers=False, kptImageScaleFactor=0.5), cam
    )
    f_full = fx_full.process(img)
    f_half = fx_half.process(img)
    assert int(np.asarray(f_half.valid).sum()) > 20
    xy = np.asarray(f_half.xy)[np.asarray(f_half.valid)]
    # coordinates are full-resolution: they must span the full image extent
    assert xy[:, 0].max() > W * 0.6 and xy[:, 1].max() > H * 0.6
    assert xy[:, 0].min() >= 0 and xy[:, 0].max() < W
