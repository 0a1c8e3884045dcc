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

import pytest


@pytest.fixture(autouse=True, scope="module")
def _release_compiled_executables():
    """Free compiled XLA programs after each test module.

    The XLA CPU JIT mmaps code/data pages for every compiled executable
    and never coalesces them; one full-suite process accumulates
    ~65,000 memory mappings and then DIES (SIGSEGV/SIGABRT inside
    ``backend_compile_and_load``) when it crosses the kernel's
    ``vm.max_map_count`` limit (default 65530).  Root cause established
    by sampling ``/proc/<pid>/maps`` during a full run: the count
    climbs monotonically and the crash lands exactly at the limit,
    which is also why the crash point was deterministic, moved when
    tests were added, and never reproduced in half-suite runs.
    Dropping the executable caches between modules keeps the count
    bounded at the cost of cross-module recompiles.
    """
    yield
    jax.clear_caches()
