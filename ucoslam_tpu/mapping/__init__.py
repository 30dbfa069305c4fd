"""Map data model: arenas, frames, the world state, covisibility."""

from ucoslam_tpu.mapping.arena import Arena  # noqa: F401
from ucoslam_tpu.mapping.frame import Frame  # noqa: F401
from ucoslam_tpu.mapping.map import Map, MapState  # noqa: F401
