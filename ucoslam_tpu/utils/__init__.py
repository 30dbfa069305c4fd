from ucoslam_tpu.utils.timers import Debug, StageTimers, timers  # noqa: F401
