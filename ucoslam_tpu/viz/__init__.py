from ucoslam_tpu.viz.viewer import MapViewer  # noqa: F401
