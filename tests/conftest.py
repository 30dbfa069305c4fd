"""Test configuration: force an 8-device virtual CPU mesh.

Tests must be CPU-runnable and fast; the axon TPU plugin (sitecustomize) is
disabled by clearing PALLAS_AXON_POOL_IPS *before* jax import. bench.py and
__graft_entry__.py use the real TPU via the default environment.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon sitecustomize may have force-set jax_platforms before us.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
