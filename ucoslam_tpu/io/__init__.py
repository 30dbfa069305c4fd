"""Dataset IO, synthetic sequences, serialization, trajectory tooling."""

from ucoslam_tpu.io.synthetic import SyntheticSequence  # noqa: F401
