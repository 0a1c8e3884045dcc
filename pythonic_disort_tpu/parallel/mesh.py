"""Device meshes and batch sharding for column x band sweeps.

The framework's data-parallel axis is the flattened (columns, bands)
batch: the RTE solve is embarrassingly parallel across it (SURVEY
section 2.4), so a 1-D mesh with the batch axis sharded over all
devices keeps the interior collective-free; XLA inserts collectives
only for cross-batch diagnostics (e.g. `global_flux_stats`).

Multi-host: call `initialize_distributed()` once per process (uses
`jax.distributed.initialize`), then the same mesh spans all hosts'
devices — DCN handles host boundaries, ICI intra-slice, with no code
changes (GSPMD partitioning).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_AXIS = "batch"


def initialize_distributed(**kwargs):
    """Initialize multi-host JAX (no-op if already initialized)."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialized


def default_mesh(devices=None, axis_name: str = BATCH_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def batch_sharding(mesh: Mesh, axis_name: str = BATCH_AXIS) -> NamedSharding:
    """Sharding that splits leading (batch) axes over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def shard_batch(tree, mesh: Mesh, axis_name: str = BATCH_AXIS):
    """Place every array leaf with its leading axis sharded on the mesh."""
    sharding = batch_sharding(mesh, axis_name)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


COLLECTIVE_OPS = (
    "all-reduce", "all-gather", "all-to-all",
    "collective-permute", "reduce-scatter",
)


def count_hlo_collectives(hlo_text: str) -> dict:
    """Count collective ops in optimized-HLO text, per op kind.

    The production sharded solve (`parallel.solve_fluxes_sharded`) is
    collective-free by design: the batch axis is embarrassingly
    parallel, so any collective in its compiled program is a regression
    (and would silently evade the ``check_vma=False`` escape hatch that
    program uses).  `tests/test_parallel.py` asserts all counts are
    zero; `bench_scaling.py` records them in the scaling artifact.
    """
    counts = {}
    for op in COLLECTIVE_OPS:
        counts[op] = sum(
            1 for line in hlo_text.splitlines()
            if f"{op}-start" in line or f" {op}(" in line
            or line.lstrip().startswith(f"%{op}")
        )
    return counts
