"""ucoslam_tpu — a TPU-native keypoint + fiducial-marker SLAM engine.

A from-scratch JAX/XLA/Pallas implementation of the capability surface of
UcoSLAM (reference: /root/reference, C++/OpenCV/g2o): monocular, stereo and
RGB-D keypoint SLAM fully integrated with ArUco fiducial markers for
initialization, tracking, relocalization and real-scale recovery.

Design stance (see SURVEY.md §7): the reference's data model and
accept/reject thresholds are the spec; its architecture (two threads, tree
indices, sparse-graph LM) is replaced with batched, fixed-shape,
functionally-updated device state:

- feature extraction  -> batched FAST/ORB over the whole pyramid at once
- xflann/fbow matching -> MXU bit-matmul Hamming top-k
- kd-tree radius search -> dense windowed candidate masks
- g2o sparse LM        -> vmapped Schur-complement LM, shardable over a mesh
- tracking/mapping threads -> deterministic sequential interleave (the
  reference's `runSequential` mode) with optional async dispatch
"""

__version__ = "0.1.0"

from ucoslam_tpu.config import Params, DescriptorType, Mode, TrackingState  # noqa: F401
