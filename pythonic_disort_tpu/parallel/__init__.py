"""Parallel execution: batched solves, device meshes, sweep driver."""

from .mesh import (
    BATCH_AXIS,
    batch_sharding,
    default_mesh,
    initialize_distributed,
    shard_batch,
)
from .batch import (
    fluxes_at,
    global_flux_stats,
    make_batched_problem,
    solve_batch,
    solve_fluxes,
    solve_fluxes_sharded,
)
from .sweep import SweepDriver

__all__ = [
    "BATCH_AXIS", "batch_sharding", "default_mesh",
    "initialize_distributed", "shard_batch", "fluxes_at",
    "global_flux_stats", "make_batched_problem", "solve_batch",
    "solve_fluxes", "solve_fluxes_sharded", "SweepDriver",
]
