"""Test configuration: force JAX onto a virtual 8-device CPU platform.

Real TPU hardware in this environment is a single chip behind a tunnel
(slow per-call dispatch); multi-chip sharding paths are validated on a
virtual CPU mesh exactly as the driver's ``dryrun_multichip`` does.

The environment pre-imports jax with JAX_PLATFORMS=axon via
sitecustomize, so plain env vars are too late — flip the live jax config
before any backend is instantiated.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # tests never touch the real chip
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402  (likely already imported by sitecustomize)

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
