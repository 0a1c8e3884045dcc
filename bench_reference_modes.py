"""Benchmark the configurations the reference actually publishes
(BASELINE.md, notebook cells 291-296): full-intensity and flux-only
solves at NQuad=NLeg=NFourier=16, NLayers=16, and post-solve evaluation
timings.  Prints a table (stderr) + one JSON line (stdout).

Reference numbers (personal laptop CPU):
  intensity solve 16 layers      82    ms
  flux-only solve 16 layers       7    ms
  u(1000 tau x 100 phi) eval    159    ms
  flux eval (1000 tau)            0.85 ms
"""

import json
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

import pythonic_disort_tpu as pdt
from pythonic_disort_tpu.models.disort.api import build_problem
from pythonic_disort_tpu.models.disort.solve import solve
from pythonic_disort_tpu.models.disort import eval as ev

NLAYERS, NQUAD = 16, 16
DTYPE = jnp.float32


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def timeit(fn, reps=10):
    fn()                                   # compile / warm
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def problem_kwargs():
    rng = np.random.default_rng(0)
    tau = np.cumsum(rng.uniform(0.1, 0.5, NLAYERS))
    omega = rng.uniform(0.2, 0.9, NLAYERS)
    leg = np.zeros((NLAYERS, NQUAD + 1))
    leg[:, 0] = 1
    leg[:, 2] = 0.1
    return dict(tau_arr=tau, omega_arr=omega, NQuad=NQUAD,
                Leg_coeffs_all=leg, mu0=0.6, I0=np.pi, phi0=0.0)


def main():
    kw = problem_kwargs()
    rows = []

    # ---- solve latency (single problem, jitted end-to-end) ----
    for only_flux, label, ref_ms in [
        (False, "intensity solve (16 layers, NQuad=NFourier=16)", 82.0),
        (True, "flux-only solve (16 layers)", 7.0),
    ]:
        cfg, prob = build_problem(**kw, only_flux=only_flux, dtype=DTYPE)
        jsolve = jax.jit(lambda p: jax.tree.leaves(solve(p))[3].sum())
        t = timeit(lambda: float(np.asarray(jsolve(prob))))
        rows.append((label, t * 1e3, ref_ms))

    # ---- batched-throughput variant: 1024 intensity solves ----
    from pythonic_disort_tpu.parallel import make_batched_problem, solve_batch

    B = 1024
    rng = np.random.default_rng(1)
    taub = np.cumsum(rng.uniform(0.1, 0.5, (B, NLAYERS)), axis=1)
    omegab = rng.uniform(0.2, 0.9, (B, NLAYERS))
    legb = np.zeros((B, NLAYERS, NQUAD + 1))
    legb[..., 0] = 1
    cfgb = pdt.DisortConfig(
        nquad=NQUAD, nleg=NQUAD, nleg_all=NQUAD + 1, nfourier=NQUAD,
        nlayers=NLAYERS, nscoeffs=0, nbdrf=0, has_beam=True,
        only_flux=False, has_deltam=False,
    )
    probb = make_batched_problem(
        cfgb, taub, omegab, legb, rng.uniform(0.3, 1, B),
        np.full(B, np.pi), dtype=DTYPE,
    )
    jbatch = jax.jit(lambda p: jax.tree.leaves(solve_batch(p))[3].sum())
    tb = timeit(lambda: float(np.asarray(jbatch(probb))), reps=5)
    rows.append((f"intensity solve, batched x{B} (per solve)",
                 tb * 1e3 / B, 82.0))

    # ---- dispatch floor: the remote-runtime round trip ----
    one = jnp.ones(())
    tiny = jax.jit(lambda x: x + 1)
    t_floor = timeit(lambda: float(np.asarray(tiny(one))))
    rows.append(("dispatch+fetch floor (remote runtime RTT)",
                 t_floor * 1e3, float("nan")))

    # ---- closure evaluation (reference cells 294-296) ----
    outs = pdt.pydisort(**kw, dtype=DTYPE)
    flux_up, u_fn = outs[1], outs[4]
    # stay strictly inside the f32-rounded tau range of the solution
    tau_pts = np.linspace(0, float(np.max(kw["tau_arr"])) * (1 - 1e-6), 1000)
    phi_pts = np.linspace(0, 2 * np.pi, 100, endpoint=False)

    t = timeit(lambda: np.asarray(flux_up(tau_pts)))
    rows.append(("flux_up eval (1000 tau)", t * 1e3, 0.849))
    t = timeit(lambda: np.asarray(u_fn(tau_pts, phi_pts)), reps=5)
    rows.append(("u eval (1000 tau x 100 phi)", t * 1e3, 159.0))
    t = timeit(lambda: np.asarray(u_fn(0.5, 0.3)))
    rows.append(("u eval (1 point)", t * 1e3, 0.329))

    # device-compute-only variants: scalar-reduce on device so the
    # timing excludes the multi-MB result transfer through the tunnel
    from pythonic_disort_tpu.models.disort import eval as ev2

    cfg2, prob2 = build_problem(**kw, dtype=DTYPE)
    sol2 = jax.block_until_ready(jax.jit(solve)(prob2))
    tj = jnp.asarray(tau_pts, DTYPE)
    pj = jnp.asarray(phi_pts, DTYPE)
    red_u = jax.jit(lambda s, t_, p_: ev2.u(s, t_, p_).sum())
    t = timeit(lambda: float(np.asarray(red_u(sol2, tj, pj))), reps=5)
    rows.append(("u eval (1000x100, device compute only)", t * 1e3, 159.0))
    red_f = jax.jit(lambda s, t_: ev2.flux_up(s, t_).sum())
    t = timeit(lambda: float(np.asarray(red_f(sol2, tj))))
    rows.append(("flux_up eval (1000 tau, device compute only)",
                 t * 1e3, 0.849))

    log(f"{'mode':48s} {'ms':>10s} {'ref ms':>8s} {'speedup':>8s}")
    result = {}
    for label, ms, ref in rows:
        log(f"{label:48s} {ms:10.3f} {ref:8.2f} {ref/ms:7.1f}x")
        result[label] = round(ms, 4)

    print(json.dumps({
        "metric": "reference-published benchmark modes (ms)",
        "value": result["intensity solve (16 layers, NQuad=NFourier=16)"],
        "unit": "ms",
        "modes_ms": result,
        "vs_baseline": round(82.0 / result[
            "intensity solve (16 layers, NQuad=NFourier=16)"], 2),
    }))


if __name__ == "__main__":
    main()
