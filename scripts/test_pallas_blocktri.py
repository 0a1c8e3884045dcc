"""TPU check of the Pallas block-Thomas kernel vs the jnp lanes path:
correctness, compile time, runtime at the production footprint."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pythonic_disort_tpu.ops.blocktri import solve_block_tridiag
from pythonic_disort_tpu.ops.pallas_blocktri import solve_block_tridiag_lanes_pallas

L, n = 64, 32
B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
dtype = jnp.float32

rng = np.random.default_rng(0)
lower = rng.standard_normal((L, B, n, n)) * 0.1
diag = rng.standard_normal((L, B, n, n)) * 0.1 + np.eye(n) * 4
upper = rng.standard_normal((L, B, n, n)) * 0.1
rhs = rng.standard_normal((L, B, n))

lo, di, up, rh = (jnp.asarray(x, dtype) for x in (lower, diag, upper, rhs))

# lanes layout for the pallas kernel: (L, n, n, B) / (L, n, B)
lo_t, di_t, up_t = (jnp.moveaxis(x, 1, 3) for x in (lo, di, up))
rh_t = jnp.moveaxis(rh, 1, 2)

t0 = time.time()
jp = jax.jit(solve_block_tridiag_lanes_pallas)
xp = np.asarray(jp(lo_t, di_t, up_t, rh_t))
print(f"pallas compile+run: {time.time()-t0:.1f}s")

t0 = time.time()
jr = jax.jit(solve_block_tridiag)
xr = np.asarray(jr(lo, di, up, rh))
print(f"jnp    compile+run: {time.time()-t0:.1f}s")

xp_cmp = np.moveaxis(xp, 2, 1)
err = np.max(np.abs(xp_cmp - xr)) / np.max(np.abs(xr))
print(f"max rel diff pallas vs jnp: {err:.3e}")

# numpy dense check on a few lanes
for b in range(3):
    A = np.zeros((L * n, L * n))
    for l in range(L):
        A[l*n:(l+1)*n, l*n:(l+1)*n] = diag[l, b]
        if l > 0:
            A[l*n:(l+1)*n, (l-1)*n:l*n] = lower[l, b]
        if l < L - 1:
            A[l*n:(l+1)*n, (l+1)*n:(l+2)*n] = upper[l, b]
    xd = np.linalg.solve(A, rhs[:, b].ravel()).reshape(L, n)
    e = np.max(np.abs(xd - xp_cmp[:, b])) / np.max(np.abs(xd))
    print(f"lane {b}: vs dense LU rel err {e:.3e}")


def timeit(f, *a, reps=5):
    s = jax.jit(lambda *a: jnp.sum(f(*a)))
    float(np.asarray(s(*a)))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(s(*a)))
        best = min(best, time.perf_counter() - t0)
    return best


print(f"B={B}: pallas {timeit(solve_block_tridiag_lanes_pallas, lo_t, di_t, up_t, rh_t)*1e3:.1f} ms, "
      f"jnp {timeit(solve_block_tridiag, lo, di, up, rh)*1e3:.1f} ms")
