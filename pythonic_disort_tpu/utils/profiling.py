"""Observability: wall-clock stage timing and device tracing.

The reference has no profiling subsystem (its only performance artifacts
are notebook ``%timeit`` cells — SURVEY section 5); this module provides
the framework's first-class equivalents:

- ``StageTimer`` — structured wall-clock timing of named stages with a
  device-sync fetch (``block_until_ready`` is not reliable through
  remote runtimes, so syncing is done by materializing a scalar).
- ``trace`` — context manager around ``jax.profiler`` for on-device
  traces viewable in TensorBoard/Perfetto.
- ``nan_guard`` — context manager enabling ``jax_debug_nans`` (the
  framework's sanitizer mode; see tests/test_determinism.py).
"""

from __future__ import annotations

import contextlib
import json
import time

import numpy as np
import jax
import jax.numpy as jnp


def device_sync(x):
    """Force completion of all device work producing ``x`` and return it."""
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(jax.device_get(jnp.sum(leaves[0]) * 0 + 1))
    return x


class StageTimer:
    """Accumulate named stage timings; render as a JSON line."""

    def __init__(self):
        self.stages = {}

    @contextlib.contextmanager
    def stage(self, name, sync=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                device_sync(sync)
            self.stages[name] = self.stages.get(name, 0.0) + (
                time.perf_counter() - t0
            )

    def report(self):
        return json.dumps({k: round(v, 6) for k, v in self.stages.items()})


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace (open with TensorBoard's profile plugin)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def nan_guard():
    """Raise on any NaN produced inside the context (debug sanitizer)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", True)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)
