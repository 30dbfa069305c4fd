"""Multi-device distribution: meshes and the sharded bundle adjuster."""

from ucoslam_tpu.parallel.mesh import make_mesh  # noqa: F401
from ucoslam_tpu.parallel.sharded_ba import sharded_ba_solve, shard_ba_problem  # noqa: F401
