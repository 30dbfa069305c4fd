"""Fiducial markers: IPPE pose solver, detection, marker-map integration."""

from ucoslam_tpu.markers.ippe import ippe_square_poses  # noqa: F401
from ucoslam_tpu.markers.detector import ArucoDetector  # noqa: F401
