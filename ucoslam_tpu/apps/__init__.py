"""CLI applications (counterpart of reference utils/ + tests/ binaries)."""
