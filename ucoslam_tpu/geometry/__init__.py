"""Batched differentiable geometry: SO3/SE3/Sim3, camera models, two-view."""

from ucoslam_tpu.geometry.se3 import (  # noqa: F401
    so3_exp,
    so3_log,
    se3_exp,
    se3_log,
    se3_inverse,
    se3_compose,
    se3_apply,
    se3_from_Rt,
    se3_identity,
)
from ucoslam_tpu.geometry.sim3 import (  # noqa: F401
    sim3_exp,
    sim3_log,
    sim3_inverse,
    sim3_compose,
    sim3_apply,
    sim3_from_sRt,
)
from ucoslam_tpu.geometry.camera import CameraParams  # noqa: F401
from ucoslam_tpu.geometry.triangulate import triangulate_dlt, triangulate_checked  # noqa: F401
from ucoslam_tpu.geometry.epipolar import (  # noqa: F401
    fundamental_from_poses,
    epipolar_line_sq_dist,
)
from ucoslam_tpu.geometry.horn import horn_align, ate_rmse  # noqa: F401
