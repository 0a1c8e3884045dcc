"""TPU production-path tests: run with a real TPU attached.

The main test suite (tests/) forces the CPU backend for hermetic golden
verification; this directory tests what the benchmark actually runs —
the f32 + Pallas production path — and is skipped wholesale when no TPU
is present.  Run: ``python -m pytest tests_tpu/ -q``.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax


def pytest_collection_modifyitems(config, items):
    if jax.default_backend() != "tpu":
        skip = pytest.mark.skip(reason="requires a TPU backend")
        for item in items:
            item.add_marker(skip)
