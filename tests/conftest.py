"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Real TPU hardware in this environment is a single chip; multi-chip
sharding paths are validated on a virtual CPU mesh exactly as the driver's
``dryrun_multichip`` does. Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
