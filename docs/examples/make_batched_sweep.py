"""Generate docs/examples/batched_sweep.ipynb (run from repo root)."""

import nbformat as nbf

nb = nbf.v4.new_notebook()
md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

cells = [
    md("""# Production batched sweep: columns x bands, sharding, checkpoint/resume

What the reference cannot do: the framework's production path solves a
whole (columns x spectral bands) batch as ONE compiled program, shards
it over a device mesh with zero interior collectives, and streams
resumable chunks.  This demo runs on an 8-device virtual CPU mesh (the
idiomatic JAX multi-chip-without-a-cluster backend); the identical code
runs on a TPU pod slice."""),
    code("""import os, sys
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
import jax
# CPU demo.  Use the config (not the JAX_PLATFORMS env var): with some
# PJRT plugins registered, selecting "cpu" via the env var still
# initializes the plugin and its host->device transfer can round f64
# at the ULP level; the config route never activates it.
jax.config.update("jax_platforms", "cpu")
for up in ("../..", "."):
    p = os.path.abspath(up)
    if os.path.isdir(os.path.join(p, "pythonic_disort_tpu")):
        sys.path.insert(0, p)
        break

import numpy as np
import jax
import jax.numpy as jnp

import pythonic_disort_tpu as pdt
from pythonic_disort_tpu import parallel
print(jax.devices())"""),
    md("""## 1. A batch of atmospheres

Each batch element is one (column, band) pair: its own optical-depth
grid, single-scattering albedos, phase function, and beam geometry."""),
    code("""B, L, NQuad = 32, 16, 16
rng = np.random.default_rng(0)
tau = np.cumsum(rng.uniform(0.1, 0.5, (B, L)), axis=1)
omega = rng.uniform(0.4, 0.95, (B, L))
g = rng.uniform(0.5, 0.8, (B, L))
leg = g[..., None] ** np.arange(NQuad + 1)[None, None, :]

config = pdt.DisortConfig(
    nquad=NQuad, nleg=NQuad, nleg_all=NQuad + 1, nfourier=1,
    nlayers=L, nscoeffs=0, nbdrf=0, has_beam=True,
    only_flux=True, has_deltam=True,
)
problem = parallel.make_batched_problem(
    config, tau, omega, leg,
    mu0=rng.uniform(0.3, 1.0, B), I0=np.full(B, np.pi),
    f_arr=leg[..., NQuad], dtype=jnp.float64,
)
tau_eval = jnp.asarray(tau)"""),
    md("""## 2. One fused program: batched solve + flux evaluation"""),
    code("""fup, fdn, fdir = jax.jit(parallel.solve_fluxes)(problem, tau_eval)
print("flux_up:", fup.shape, " first column:", np.round(np.asarray(fup[0, :4]), 5))"""),
    md("""## 3. Shard the batch over the mesh

`solve_fluxes_sharded` pins the decomposition with `shard_map`; the
compiled interior contains ZERO collectives (asserted in
`tests/test_parallel.py`), so weak scaling is bounded by load balance
only."""),
    code("""mesh = parallel.default_mesh()
problem_sh = parallel.shard_batch(problem, mesh)
tau_sh = parallel.shard_batch(tau_eval, mesh)
fup_sh, fdn_sh, fdir_sh = jax.jit(
    lambda p, t: parallel.solve_fluxes_sharded(p, t, mesh)
)(problem_sh, tau_sh)
print("sharded == unsharded:",
      bool(jnp.allclose(fup_sh, fup, rtol=1e-12, atol=1e-14)))
print("shards per output:", len(fup_sh.addressable_shards))"""),
    md("""## 4. Resumable sweeps

`SweepDriver` streams chunks with double-buffered dispatch and writes
resumable result shards + a manifest; re-running skips completed
chunks (checkpoint/resume for pod-scale jobs)."""),
    code("""import tempfile, pathlib
out_dir = tempfile.mkdtemp(prefix="pdt_sweep_")

problem_for_chunk = lambda lo, hi: jax.tree.map(lambda x: x[lo:hi], problem)
tau_for_chunk = lambda lo, hi: tau_eval[lo:hi]

driver = parallel.SweepDriver(out_dir, chunk_size=8)
times = driver.run(problem_for_chunk, tau_for_chunk, n_total=B)
print("chunks solved:", sorted(times))
print("files:", sorted(p.name for p in pathlib.Path(out_dir).iterdir()))

# resume: a fresh driver skips every finished chunk via the manifest
driver2 = parallel.SweepDriver(out_dir, chunk_size=8)
times2 = driver2.run(problem_for_chunk, tau_for_chunk, n_total=B)
print("chunks re-solved on resume:", sorted(times2))

gathered = driver2.gather()
print("gathered flux_up:", gathered["flux_up"].shape,
      " == fused program:",
      bool(np.allclose(gathered["flux_up"], np.asarray(fup))))"""),
]

nb["cells"] = cells
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}
with open("docs/examples/batched_sweep.ipynb", "w") as f:
    nbf.write(nb, f)
print("written")
