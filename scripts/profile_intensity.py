"""Per-stage timing of the intensity production path (bench_intensity
config: chunk of 2 cols x 128 bands, NFourier=16, NT-corrected u at 64
tau x 4 phi).  Splits the ~218 ms chunk into solve / u eval / NT
correction so the optimization targets the real bar.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

_cache = os.environ.get("PDT_COMPILE_CACHE", "/root/.cache/pdt_jax")
if _cache not in ("0", ""):
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax
import jax.numpy as jnp

from bench import NBANDS, NLAYERS, NQUAD
from pythonic_disort_tpu import DisortConfig
from pythonic_disort_tpu.parallel import make_batched_problem, solve_intensity
from pythonic_disort_tpu.parallel.batch import solve_batch, u_at, u_corrected_at
from pythonic_disort_tpu.models.disort.nt import nt_correction
from pythonic_disort_tpu.models.disort import eval as ev


def timeit(fn, *args, reps=5, inner=4):
    from jax import lax

    leaves, treedef = jax.tree.flatten(args)

    def repeat(s0, *flat):
        def body(_, carry):
            s, x0 = carry
            a = jax.tree.unflatten(treedef, (x0,) + tuple(flat[1:]))
            out = fn(*a)
            s2 = sum(jnp.sum(x) for x in jax.tree.leaves(out)).astype(jnp.float32)
            return s2, flat[0] + 0.0 * s2
        s, _ = lax.fori_loop(0, inner, body, (s0, flat[0]))
        return s

    rfn = jax.jit(repeat)
    z = jnp.float32(0.0)
    float(np.asarray(rfn(z, *leaves)))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(rfn(z, *leaves)))
        best = min(best, time.perf_counter() - t0)
    return max(best - 0.033, 1e-9) / inner


def main():
    chunk = int(os.environ.get("BENCH_INT_CHUNK_COLS", 2))
    nfourier = 16
    rng = np.random.default_rng(7)
    B = chunk * NBANDS
    nleg_all = NQUAD + 1
    thickness = rng.uniform(0.05, 0.5, (B, NLAYERS))
    tau = np.cumsum(thickness, axis=1)
    omega = rng.uniform(0.3, 0.99, (B, NLAYERS))
    g = rng.uniform(0.5, 0.85, (B, NLAYERS))
    leg = g[..., None] ** np.arange(nleg_all)[None, None, :]
    config = DisortConfig(
        nquad=NQUAD, nleg=NQUAD, nleg_all=nleg_all, nfourier=nfourier,
        nlayers=NLAYERS, nscoeffs=0, nbdrf=0, has_beam=True,
        only_flux=False, has_deltam=True, nt_correct=True,
    )
    problem = make_batched_problem(
        config, tau, omega, leg, rng.uniform(0.2, 1.0, B),
        np.full(B, np.pi), f_arr=leg[..., NQUAD], dtype=jnp.float32,
    )
    tau_eval = jnp.asarray(tau * (1 - 1e-6), jnp.float32)
    phi_eval = jnp.broadcast_to(
        jnp.asarray([0.0, 1.6, 3.1, 4.7], jnp.float32), (B, 4)
    )
    print(f"B={B} solves/chunk, NF={nfourier}, L={NLAYERS}, NQuad={NQUAD}",
          file=sys.stderr)

    rows = []
    rows.append(("solve_intensity (full)",
                 timeit(lambda p, t, ph: solve_intensity(p, t, ph),
                        problem, tau_eval, phi_eval)))
    rows.append(("solve_batch only", timeit(solve_batch, problem)))
    sol = jax.block_until_ready(jax.jit(solve_batch)(problem))
    rows.append(("u_at eval only", timeit(u_at, sol, tau_eval, phi_eval)))
    rows.append(("nt_correction only",
                 timeit(lambda s, t, p: jax.vmap(nt_correction)(s, t, p),
                        sol, tau_eval, phi_eval)))
    # flux-config solve at the same lane count for comparison: NF=1
    # with 16x the solves would be the equivalent flux-work footprint.
    print(f"{'stage':34s} {'ms':>9s}")
    for name, t in rows:
        print(f"{name:34s} {t*1e3:9.1f}")


if __name__ == "__main__":
    main()
