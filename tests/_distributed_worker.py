"""Worker for the 2-process jax.distributed CPU test.

Usage: python _distributed_worker.py <coordinator> <num_procs> <pid>

Each process owns 2 virtual CPU devices (set via XLA_FLAGS by the
launcher); the global mesh spans num_procs * 2 devices.  The worker
builds the same deterministic batched problem everywhere, shards it
over the global mesh, runs the shard_map production step, and checks
its addressable output shards against an unsharded local solve.
"""

import sys

import numpy as np

import jax

coordinator, num_procs, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

from pythonic_disort_tpu.parallel import (
    initialize_distributed,
    solve_fluxes,
    solve_fluxes_sharded,
    make_batched_problem,
)

initialize_distributed(
    coordinator_address=coordinator, num_processes=num_procs, process_id=pid
)

import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pythonic_disort_tpu import DisortConfig

ndev = len(jax.devices())
assert ndev == 2 * num_procs, (ndev, num_procs)
assert jax.process_count() == num_procs

L, NQUAD = 4, 8
B = 4 * ndev
rng = np.random.default_rng(0)
thickness = rng.uniform(0.1, 0.5, (B, L))
tau = np.cumsum(thickness, axis=1)
omega = rng.uniform(0.2, 0.8, (B, L))
leg = np.zeros((B, L, NQUAD + 1))
leg[..., 0] = 1
mu0 = rng.uniform(0.3, 1.0, B)
I0 = np.full(B, np.pi)
config = DisortConfig(
    nquad=NQUAD, nleg=NQUAD, nleg_all=NQUAD + 1, nfourier=1, nlayers=L,
    nscoeffs=0, nbdrf=0, has_beam=True, only_flux=True, has_deltam=False,
)
problem = make_batched_problem(config, tau, omega, leg, mu0, I0,
                               dtype=jnp.float64)
tau_eval = jnp.asarray(tau, jnp.float64)

mesh = Mesh(np.asarray(jax.devices()), ("batch",))
sharding = NamedSharding(mesh, P("batch"))


def shard(x):
    return jax.make_array_from_callback(
        x.shape, sharding, lambda idx: np.asarray(x)[idx]
    )


problem_sh = jax.tree.map(shard, problem)
tau_sh = shard(tau_eval)

out = jax.jit(
    lambda p, t: solve_fluxes_sharded(p, t, mesh)
)(problem_sh, tau_sh)

# local unsharded reference
ref = jax.jit(solve_fluxes)(problem, tau_eval)

for o, r in zip(out, ref):
    r_np = np.asarray(r)
    for s in o.addressable_shards:
        np.testing.assert_allclose(
            np.asarray(s.data), r_np[s.index], rtol=1e-12, atol=1e-12
        )

print(f"proc {pid}: OK ({ndev} global devices, "
      f"{len(out[0].addressable_shards)} local shards)", flush=True)
