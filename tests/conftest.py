"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding-aware tests exercise multi-chip paths without TPU hardware by
forcing the host platform to expose 8 devices.  Must run before jax import.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
