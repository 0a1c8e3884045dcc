"""Measure Mosaic compile time + runtime of the Pallas Jacobi kernel."""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from pythonic_disort_tpu.ops import pallas_jacobi as pj


def main():
    n = 16
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    sweeps = 6
    rng = np.random.default_rng(0)
    base = rng.standard_normal((B, n, n)) * 0.05
    A = np.einsum("bij->bji", base) + base + np.eye(n) * np.linspace(1, 4, n)
    At = jnp.asarray(np.moveaxis(A, 0, -1), jnp.float32)   # (n, n, B)

    fn = jax.jit(lambda x: jax.tree.map(jnp.sum, pj.jacobi_eigh_lanes_pallas(x, sweeps)))
    t0 = time.perf_counter()
    lowered = fn.lower(At)
    print(f"lower: {time.perf_counter()-t0:.1f}s", flush=True)
    t0 = time.perf_counter()
    compiled = lowered.compile()
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)
    out = compiled(At)
    [float(np.asarray(o)) for o in out]
    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        out = compiled(At)
        [float(np.asarray(o)) for o in out]
        best = min(best, time.perf_counter() - t0)
    print(f"runtime: {best*1e3:.1f} ms for {B} {n}x{n}", flush=True)


if __name__ == "__main__":
    main()
