"""Frame ingestion: raw image(s) -> fully-populated Frame.

Counterpart of the reference FrameExtractor (frameextractor.{h,cpp},
obfuscated; behavior per SURVEY.md §2): BGR->gray, optional resize by
kptImageScaleFactor, keypoint detect+describe, keypoint undistortion,
ArUco marker detection + IPPE (plug-in detector), stereo row matching ->
per-keypoint depth (frameextractor.cpp:1456-2595), RGB-D depth ingestion
scaled by rgb_depthscale (:2688-2815).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ucoslam_tpu.config import Params
from ucoslam_tpu.features.orb import ORBExtractor
from ucoslam_tpu.geometry.camera import CameraParams
from ucoslam_tpu.mapping.frame import Frame, empty_frame, empty_markers
from ucoslam_tpu.ops.hamming import hamming_matrix, match_best2
from ucoslam_tpu.ops.image import rgb_to_gray, bilinear_sample


class FrameExtractor:
    def __init__(self, params: Params, cam: CameraParams, marker_detector=None):
        from ucoslam_tpu.config import DescriptorType

        self.params = params
        self.cam = cam
        native = {
            DescriptorType.ORB: "orb",
            DescriptorType.FREAK: "freak",
            DescriptorType.SURF: "surf",
        }
        if params.kpDescriptorType in native:
            self.orb = ORBExtractor(
                max_features=params.maxKeyPointsPerFrame,
                n_levels=params.nOctaveLevels,
                scale_factor=params.scaleFactor,
                # KPNonMaximaSuppresion thins the keypoint field -> smaller
                # maps (reference semantics): one keypoint per coarse cell
                cell=64 if params.KPNonMaximaSuppresion else 32,
                k_per_cell=1 if params.KPNonMaximaSuppresion else 4,
                descriptor=native[params.kpDescriptorType],
            )
        else:
            # Feature2DSerializable::create plug point: AKAZE/BRISK route
            # through the cv2-backed GridExtractor (gridextractor.cpp:36-39)
            from ucoslam_tpu.features.grid_extractor import GridExtractor

            self.orb = GridExtractor(params)
        self.marker_detector = marker_detector
        self._sensitivity_boost = 0.0  # autoAdjustKpSensitivity state

    def _base_frame(self, img: np.ndarray, fseq: int) -> Frame:
        gray = rgb_to_gray(jnp.asarray(img))
        # optional detector-resolution reduction (kptImageScaleFactor,
        # ucoslamtypes.h:131; the reference resizes the gray image before
        # detection and keeps all downstream coordinates full-resolution)
        ksf = float(self.params.kptImageScaleFactor)
        if ksf != 1.0:
            H, W = gray.shape
            small = (max(8, int(round(H * ksf))), max(8, int(round(W * ksf))))
            gray_det = jax.image.resize(gray, small, method="linear")
            kps = self.orb.detect_and_compute(gray_det)
            kps = kps._replace(
                xy=kps.xy / jnp.float32(ksf)  # back to full-res pixel coords
            )
        else:
            kps = self.orb.detect_and_compute(gray)
        if self.params.autoAdjustKpSensitivity:
            # low-texture adaptation (ORBextractor::setSensitivity,
            # ORBextractor.h:113): when the detector underfills its budget,
            # lower the FAST threshold for subsequent frames; restore slowly
            fill = float(np.asarray(kps.valid).mean())
            if fill < 0.5 and getattr(self.orb, "fast_threshold", None):
                self.orb.fast_threshold = max(3.0, self.orb.fast_threshold - 1.0)
            elif fill > 0.9 and getattr(self.orb, "fast_threshold", 0) < 7.0:
                self.orb.fast_threshold = min(7.0, self.orb.fast_threshold + 1.0)
        und = self.cam.undistort_points(kps.xy) if self.cam.has_distortion() else kps.xy
        f = empty_frame(self.params.maxKeyPointsPerFrame)
        f = f._replace(
            fseq=jnp.int32(fseq),
            xy=kps.xy,
            und_xy=und,
            octave=kps.octave,
            angle=kps.angle,
            response=kps.response,
            desc=kps.desc,
            valid=kps.valid,
        )
        if self.params.detectMarkers and self.marker_detector is not None:
            f = f._replace(markers=self.marker_detector.detect(np.asarray(img), self.cam))
        return f

    # -- monocular ------------------------------------------------------
    def process(self, img: np.ndarray, fseq: int = 0) -> Frame:
        return self._base_frame(img, fseq)

    # -- RGB-D ----------------------------------------------------------
    def process_rgbd(self, img: np.ndarray, depth: np.ndarray, fseq: int = 0) -> Frame:
        """depth: (H, W) raw depth image; meters = raw * rgb_depthscale."""
        f = self._base_frame(img, fseq)
        d = bilinear_sample(jnp.asarray(depth, jnp.float32), f.xy, mode="nearest")
        d = d * self.cam.rgb_depthscale
        d = jnp.where(f.valid & (d > 0), d, 0.0)
        return f._replace(depth=d)

    # -- stereo ---------------------------------------------------------
    def process_stereo(self, left: np.ndarray, right: np.ndarray, fseq: int = 0) -> Frame:
        """Rectified stereo: match left keypoints along right rows -> depth.

        The reference matches L/R along rectified rows and stores depth =
        bl * fx / disparity (frameextractor.cpp:2595).
        """
        f = self._base_frame(left, fseq)
        gray_r = rgb_to_gray(jnp.asarray(right))
        kr = self.orb.detect_and_compute(gray_r)
        depth = _stereo_depth(
            f, kr.xy, kr.desc, kr.octave, kr.valid, jnp.float32(self.cam.bf),
            jnp.float32(self.params.maxDescDistance),
        )
        return f._replace(depth=depth)


@jax.jit
def _stereo_depth(f: Frame, xy_r, desc_r, octave_r, valid_r, bf, max_desc_dist):
    d = hamming_matrix(f.desc, desc_r)
    row_ok = jnp.abs(f.xy[:, None, 1] - xy_r[None, :, 1]) <= 2.0
    disp = f.xy[:, None, 0] - xy_r[None, :, 0]
    disp_ok = (disp > 0.1) & (disp < 200.0)
    oct_ok = jnp.abs(f.octave[:, None] - octave_r[None, :]) <= 1
    mask = row_ok & disp_ok & oct_ok & valid_r[None, :]
    idx, best, _ = match_best2(d, valid_rows=f.valid, extra_mask=mask)
    ok = best <= max_desc_dist
    disparity = f.xy[:, 0] - xy_r[idx, 0]
    depth = bf / disparity.clip(0.1)
    return jnp.where(ok & f.valid & (disparity > 0.1), depth, 0.0)
