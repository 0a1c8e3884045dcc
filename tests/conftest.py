"""Test configuration: force CPU backend with 8 virtual devices.

Sharding tests exercise multi-chip paths on a faked device mesh
(`--xla_force_host_platform_device_count`), the idiomatic JAX
"multi-node without a cluster" backend.  Must run before any JAX
backend initialization.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
