"""Optimization: robust kernels, PnP, bundle adjustment, pose graph."""

from ucoslam_tpu.optim.pnp import motion_only_lm, pnp_ransac  # noqa: F401
