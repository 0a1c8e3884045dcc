"""pythonic-disort-tpu: a TPU-native discrete-ordinates RTE framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PythonicDISORT (LDEO-CREW/Pythonic-DISORT): a 1D radiative-transfer
solver for plane-parallel multi-layer atmospheres with delta-M scaling,
Nakajima-Tanaka corrections, beam/isotropic/boundary sources, BDRF
surfaces, and semi-analytic output evaluation — built batch-first so a
single compiled program solves whole columns x spectral-bands batches,
sharded over TPU device meshes.

Two API levels:
- ``pydisort(...)`` — drop-in, closure-returning, reference-compatible.
- ``build_problem`` / ``solve`` / ``models.disort.eval`` — the pure
  functional core for jit/vmap/pjit composition (see ``parallel``).
"""

from .config import enable_x64_if_requested, set_matmul_precision

enable_x64_if_requested()
set_matmul_precision()

from .models.disort.api import pydisort, build_problem  # noqa: E402
from .models.disort.solve import solve  # noqa: E402
from .models.disort.types import (  # noqa: E402
    DisortConfig, DisortProblem, DisortSolution,
)
from . import subroutines  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "pydisort", "build_problem", "solve", "subroutines",
    "DisortConfig", "DisortProblem", "DisortSolution",
]
