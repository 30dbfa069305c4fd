"""Multi-device distribution: meshes, sharded BA, sharded pose graph."""

from ucoslam_tpu.parallel.distributed import (  # noqa: F401
    global_mesh,
    init_distributed,
    is_primary,
)
from ucoslam_tpu.parallel.mesh import make_mesh  # noqa: F401
from ucoslam_tpu.parallel.sharded_ba import sharded_ba_solve, shard_ba_problem  # noqa: F401
from ucoslam_tpu.parallel.sharded_posegraph import (  # noqa: F401
    sharded_pose_graph_solve,
    shard_pose_graph_problem,
)
