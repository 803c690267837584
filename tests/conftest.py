"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Sharding-aware tests exercise multi-chip paths without TPU hardware by
forcing the host platform to expose 8 devices.  The environment's TPU
plugin registers itself at interpreter start and overrides jax_platforms,
so the override must go through jax.config (env vars alone are ignored).
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables between test modules.

    The suite compiles hundreds of distinct programs across modules; keeping
    them all live in one process grew RSS until XLA CPU segfaulted mid-suite
    (observed at ~2/3 through).  Per-module clearing caps the footprint at
    the cost of a few redundant compiles."""
    yield
    jax.clear_caches()
