"""Per-frame perception: ORB extraction and frame ingestion."""

from ucoslam_tpu.features.orb import ORBExtractor, Keypoints  # noqa: F401
