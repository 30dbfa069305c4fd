"""Device-mesh helpers.

The reference has no distributed backend (SURVEY.md §2.3 — intra-process
threads only); multi-chip scaling is this framework's new capability. The
mesh convention: a 1-D axis named "pt" over which map-point blocks (and
their observations) shard; keyframe state is replicated (camera count is
tiny next to point count, exactly the property that makes the reduced
camera system cheap to psum).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "pt", devices=None) -> Mesh:
    devs = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))
