"""Test configuration: force an 8-device virtual CPU mesh before JAX loads.

Multi-chip sharding tests run against this virtual mesh, mirroring how the
driver dry-runs the multi-chip path without real hardware.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# Keep tests deterministic and CPU-friendly.
os.environ.setdefault("JAX_ENABLE_X64", "0")
# Any subprocess a test spawns inherits the CPU pin: JAX_PLATFORMS alone is
# overridden where the axon TPU plugin force-registers itself, and the TPU
# is single-tenant — a test child attaching to it would crash or wedge
# whatever is running there. Entry points honor this via
# utils/cache.force_platform_from_env (config API, pre-init).
os.environ.setdefault("A2F_FORCE_PLATFORM", "cpu")

import jax  # noqa: E402

# The env var alone is not enough when a TPU PJRT plugin force-registers
# itself; pin the platform through the config API as well.
jax.config.update("jax_platforms", "cpu")
