"""Alternative-descriptor extractor plug point (AKAZE/BRISK/ORB-cv …).

Counterpart of the reference GridExtractor (gridextractor.{h:29,cpp:36-285}):
wraps OpenCV detectors over an image grid for descriptor types other than
the native ORB, with the per-type matching distance table
(gridextractor.cpp:36-39: AKAZE 120, BRISK 70, FREAK 70, SURF 0.125).

Only binary 256-bit descriptors integrate with the TPU Hamming pipeline;
AKAZE(MLDB-256)/BRISK are truncated/padded to 256 bits. This is a host-side
compatibility path — the native ORB extractor is the production frontend.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ucoslam_tpu.config import DescriptorType, Params
from ucoslam_tpu.features.orb import Keypoints

# reference per-type minimum descriptor distances (gridextractor.cpp:36-39)
DESC_DISTANCES = {
    DescriptorType.ORB: 50.0,
    DescriptorType.AKAZE: 120.0,
    DescriptorType.BRISK: 70.0,
    DescriptorType.FREAK: 70.0,
    DescriptorType.SURF: 0.125,
}


class GridExtractor:
    def __init__(self, params: Params):
        import cv2

        self.params = params
        t = params.kpDescriptorType
        if t == DescriptorType.AKAZE:
            self._det = cv2.AKAZE_create()
        elif t == DescriptorType.BRISK:
            self._det = cv2.BRISK_create()
        elif t == DescriptorType.ORB:
            self._det = cv2.ORB_create(nfeatures=params.maxKeyPointsPerFrame)
        else:
            raise ValueError(f"unsupported GridExtractor type {t}")
        self.n_slots = params.maxKeyPointsPerFrame

    def detect_and_compute(self, img) -> Keypoints:
        import cv2

        arr = np.asarray(img)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        if arr.ndim == 3:
            arr = cv2.cvtColor(arr, cv2.COLOR_BGR2GRAY)
        kps, desc = self._det.detectAndCompute(arr, None)
        n = min(len(kps), self.n_slots)
        xy = np.zeros((self.n_slots, 2), np.float32)
        resp = np.zeros(self.n_slots, np.float32)
        octv = np.zeros(self.n_slots, np.int32)
        ang = np.zeros(self.n_slots, np.float32)
        packed = np.zeros((self.n_slots, 8), np.uint32)
        if n:
            order = np.argsort([-k.response for k in kps])[:n]
            for j, i in enumerate(order):
                k = kps[i]
                xy[j] = k.pt
                resp[j] = k.response
                octv[j] = max(0, k.octave & 0xFF) if k.octave < 128 else 0
                ang[j] = np.deg2rad(k.angle) if k.angle >= 0 else 0.0
                d = desc[i]
                raw = np.zeros(32, np.uint8)
                raw[: min(32, len(d))] = d[:32]
                packed[j] = raw.view(np.uint32)
        valid = np.arange(self.n_slots) < n
        return Keypoints(
            xy=jnp.asarray(xy),
            response=jnp.asarray(resp),
            octave=jnp.asarray(octv),
            angle=jnp.asarray(ang),
            desc=jnp.asarray(packed),
            valid=jnp.asarray(valid),
        )

    def sigma2(self, octave):
        log_s = jnp.log(jnp.float32(self.params.scaleFactor))
        return jnp.exp(2.0 * octave.astype(jnp.float32) * log_s)
