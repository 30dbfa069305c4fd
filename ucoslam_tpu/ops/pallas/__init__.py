"""Pallas TPU kernels for the hot matching paths."""
