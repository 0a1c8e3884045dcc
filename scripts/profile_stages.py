"""Per-stage timing of the production solve at the bench config.

Times each pipeline stage as its own jitted program on the attached
device, so we can see where the end-to-end milliseconds go and aim the
next kernel at the biggest bar.  Shapes follow bench.py: one chunk of
CHUNK_COLS columns x 128 bands, 64 layers, NQuad=32, flux-only f32.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import build_batch, CHUNK_COLS, NLAYERS, NQUAD
from pythonic_disort_tpu.parallel import solve_fluxes
from pythonic_disort_tpu.parallel.batch import solve_batch, fluxes_at
from pythonic_disort_tpu.ops.eig import disort_eigh
from pythonic_disort_tpu.ops.jacobi import jacobi_eigh
from pythonic_disort_tpu.ops.lanes import cholesky_lanes, triangular_solve_lanes
from pythonic_disort_tpu.ops.blocktri import solve_block_tridiag


def timeit(fn, *args, reps=5, inner=8):
    # Per-call device time via an on-device repeat loop: the remote
    # runtime costs ~33 ms per host<->device round trip, which swamps
    # ms-scale stages (r1-r3 profiles were inflated by that much).
    # The carried scalar perturbs the first leaf so XLA cannot hoist
    # the loop-invariant call (see scripts/kernel_tune.py).
    from jax import lax

    leaves, treedef = jax.tree.flatten(args)

    def repeat(s0, *flat):
        def body(_, carry):
            s, x0 = carry
            a = jax.tree.unflatten(treedef, (x0,) + tuple(flat[1:]))
            out = fn(*a)
            s2 = sum(jnp.sum(x) for x in jax.tree.leaves(out)).astype(
                jnp.float32
            )
            return s2, flat[0] + 0.0 * s2
        s, _ = lax.fori_loop(0, inner, body, (s0, flat[0]))
        return s

    rfn = jax.jit(repeat)
    z = jnp.float32(0.0)
    float(np.asarray(rfn(z, *leaves)))              # compile + warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(rfn(z, *leaves)))
        best = min(best, time.perf_counter() - t0)
    return max(best - 0.033, 1e-9) / inner


def main():
    dtype = jnp.float32
    problem, tau_eval = build_batch(dtype, CHUNK_COLS)
    B = problem.tau_arr.shape[0]
    N = NQUAD // 2
    print(f"batch B={B}, L={NLAYERS}, N={N} (NQuad={NQUAD})", file=sys.stderr)

    rows = []

    full = jax.jit(lambda p, t: solve_fluxes(p, t))
    rows.append(("full solve+fluxes", timeit(full, problem, tau_eval)))

    jsolve = jax.jit(solve_batch)
    rows.append(("solve only", timeit(jsolve, problem)))

    sol = jax.block_until_ready(jsolve(problem))
    jeval = jax.jit(fluxes_at)
    rows.append(("flux eval only", timeit(jeval, sol, tau_eval)))

    # ---- isolated kernels at the same footprint ----
    rng = np.random.default_rng(0)
    nodes_np = np.sort(rng.uniform(0.05, 1, N))
    w_np = np.full(N, 1.0 / N)
    mu = jnp.asarray(nodes_np, dtype)
    w = jnp.asarray(w_np, dtype)
    base = rng.standard_normal((B, 1, NLAYERS, N, N)) * 0.05
    Dp = jnp.asarray((base + np.swapaxes(base, -1, -2)) / 2, dtype)
    Dm = 0.5 * Dp

    eig_full = jax.jit(lambda a, b: disort_eigh(a, b, mu, w))
    rows.append((f"disort_eigh ({B}x{NLAYERS} {N}x{N})", timeit(eig_full, Dp, Dm)))

    Msym = jnp.asarray(
        (base + np.swapaxes(base, -1, -2)) / 2
        + np.eye(N) * np.linspace(1, 4, N),
        dtype,
    )
    jj = jax.jit(jacobi_eigh)
    rows.append(("  jacobi_eigh alone", timeit(jj, Msym)))

    spd = jnp.einsum("...ij,...kj->...ik", Msym, Msym) + 2 * jnp.asarray(np.eye(N), dtype)
    jc = jax.jit(cholesky_lanes)
    rows.append(("  cholesky alone", timeit(jc, spd)))
    Lc = jax.block_until_ready(jc(spd))
    jt = jax.jit(lambda L, Z: triangular_solve_lanes(L, Z, True))
    rows.append(("  tri-solve alone", timeit(jt, Lc, Msym)))

    # block-tridiagonal at BVP footprint: (L, B, NF=1, 2N, 2N)
    TN = 2 * N
    blk = rng.standard_normal((NLAYERS, B, 1, TN, TN)) * 0.1
    diag = jnp.asarray(blk + np.eye(TN) * 4, dtype)
    lower = jnp.asarray(rng.standard_normal((NLAYERS, B, 1, TN, TN)) * 0.1, dtype)
    upper = jnp.asarray(rng.standard_normal((NLAYERS, B, 1, TN, TN)) * 0.1, dtype)
    rhs = jnp.asarray(rng.standard_normal((NLAYERS, B, 1, TN)), dtype)
    jb = jax.jit(solve_block_tridiag)
    rows.append((f"block-tridiag ({NLAYERS}-step {TN}x{TN} x{B})",
                 timeit(jb, lower, diag, upper, rhs)))

    print(f"{'stage':44s} {'ms':>9s}")
    for name, t in rows:
        print(f"{name:44s} {t*1e3:9.1f}")


if __name__ == "__main__":
    main()
