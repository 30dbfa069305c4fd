"""Descriptor matching: frame-frame and map-frame projection matching."""

from ucoslam_tpu.matching.projection import match_points_to_frame  # noqa: F401
from ucoslam_tpu.matching.matcher import match_frames, match_frames_epipolar  # noqa: F401
