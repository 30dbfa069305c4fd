"""Pipeline orchestration: initializer, tracker, map manager, system."""

from ucoslam_tpu.slam.system import System  # noqa: F401
