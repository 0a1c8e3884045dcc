"""Headline benchmark: columns/s/chip for the pod-scale sweep config.

Config per BASELINE.json north star: 64 layers, NQuad=32, 128 spectral
bands per column, flux-only shortwave solve with delta-M scaling,
float32 on device.  Prints ONE JSON line:
``{"metric", "value", "unit", "vs_baseline"}``.

``vs_baseline`` is measured live against the reference implementation
(PythonicDISORT, pure NumPy/SciPy on the host CPU) running the same
per-column problem, when the reference is importable; otherwise it
falls back to the reference's published flux-only timing scaled to this
config (BASELINE.md).
"""

import json
import sys
import time

import numpy as np

import os

# Persistent compilation cache: the fused Pallas eigen program costs
# ~2 min of Mosaic/XLA compile on a cold cache (see
# docs/performance.md, "Compile-time discipline"); with the cache the
# second process pays ~seconds.  Opt out with PDT_COMPILE_CACHE=0 or
# point it elsewhere with PDT_COMPILE_CACHE=/path.
_cache = os.environ.get("PDT_COMPILE_CACHE", "/root/.cache/pdt_jax")
if _cache not in ("0", ""):
    import jax

    jax.config.update("jax_compilation_cache_dir", _cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NCOLS = int(os.environ.get("BENCH_COLS", 64))
# r5 sweep on the v5e with the H-carry fused BVP kernel: {2: 79.0,
# 4: 157.9, 8: 173.4, 16: 168.1, 32: 164.5} columns/s — moderate
# chunks win: queued dispatches pipeline host->device overheads while
# filling the kernels' lane blocks (r4 optimum was 4 at 150 cols/s).
CHUNK_COLS = int(os.environ.get("BENCH_CHUNK_COLS", 8))
NBANDS = 128
NLAYERS = 64
NQUAD = 32
REPS = 3


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def build_batch(dtype, ncols):
    import jax.numpy as jnp
    from pythonic_disort_tpu import DisortConfig
    from pythonic_disort_tpu.parallel import make_batched_problem

    rng = np.random.default_rng(42)
    B = ncols * NBANDS
    nleg = NQUAD
    nleg_all = NQUAD + 1
    thickness = rng.uniform(0.05, 0.5, (B, NLAYERS))
    tau = np.cumsum(thickness, axis=1)
    omega = rng.uniform(0.3, 0.99, (B, NLAYERS))
    g = rng.uniform(0.5, 0.85, (B, NLAYERS))
    leg = g[..., None] ** np.arange(nleg_all)[None, None, :]
    f_arr = leg[..., NQUAD]
    mu0 = rng.uniform(0.2, 1.0, B)
    I0 = np.full(B, np.pi)
    config = DisortConfig(
        nquad=NQUAD, nleg=nleg, nleg_all=nleg_all, nfourier=1,
        nlayers=NLAYERS, nscoeffs=0, nbdrf=0, has_beam=True,
        only_flux=True, has_deltam=True,
    )
    problem = make_batched_problem(
        config, tau, omega, leg, mu0, I0, f_arr=f_arr, dtype=dtype
    )
    tau_eval = jnp.asarray(tau, dtype)
    return problem, tau_eval


def bench_ours():
    """Time NCOLS columns processed in HBM-sized chunks of CHUNK_COLS
    (the sweep driver's production pattern)."""
    import jax
    import jax.numpy as jnp
    from pythonic_disort_tpu.parallel import solve_fluxes

    problem, tau_eval = build_batch(jnp.float32, CHUNK_COLS)

    # Reduce outputs to one scalar on device; sync by fetching it
    # (block_until_ready does not reliably block through remote runtimes).
    def step(problem, tau_eval):
        fup, fdn, fdir = solve_fluxes(problem, tau_eval)
        return fup.sum() + fdn.sum() + fdir.sum()

    fused = jax.jit(step)
    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    float(np.asarray(fused(problem, tau_eval)))
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")

    n_chunks = max(NCOLS // CHUNK_COLS, 1)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [fused(problem, tau_eval) for _ in range(n_chunks)]
        for o in outs:
            float(np.asarray(o))
        times.append(time.perf_counter() - t0)
    best = min(times)
    ncols_eff = n_chunks * CHUNK_COLS
    cols_per_s = ncols_eff / best
    log(f"steady-state: {best*1e3:.1f} ms for {ncols_eff} cols x {NBANDS} bands "
        f"-> {cols_per_s:.2f} columns/s/chip ({ncols_eff*NBANDS/best:.0f} solves/s)")
    return cols_per_s


def bench_intensity():
    """Intensity-mode throughput: full NT-corrected u(tau, phi) at
    NFourier=16, the reference's default intensity output for delta-M
    problems (its ``u_corrected``).  Footprint: layer boundaries x 4
    azimuths per column.  Disable with BENCH_INTENSITY=0."""
    import jax
    import jax.numpy as jnp
    from pythonic_disort_tpu import DisortConfig
    from pythonic_disort_tpu.parallel import (
        make_batched_problem, solve_intensity,
    )

    chunk = int(os.environ.get("BENCH_INT_CHUNK_COLS", 2))
    ncols = int(os.environ.get("BENCH_INT_COLS", 8))
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

    def step(problem, tau_eval, phi_eval):
        # probe footprint is one-per-layer (layer bottoms), so the
        # lanes-contracted boundary-probe path applies: the padded GC
        # tensor never materializes (batch_solve.solve_batched).
        return solve_intensity(
            problem, tau_eval, phi_eval, probes_per_layer=True
        ).sum()

    fused = jax.jit(step)
    t0 = time.perf_counter()
    float(np.asarray(fused(problem, tau_eval, phi_eval)))
    log(f"intensity compile+first run: {time.perf_counter() - t0:.2f}s")
    n_chunks = max(ncols // chunk, 1)
    times = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        outs = [fused(problem, tau_eval, phi_eval) for _ in range(n_chunks)]
        for o in outs:
            float(np.asarray(o))
        times.append(time.perf_counter() - t0)
    best = min(times)
    cols_per_s = n_chunks * chunk / best
    log(f"intensity steady-state: {best*1e3:.1f} ms for {n_chunks*chunk} cols "
        f"x {NBANDS} bands (NFourier={nfourier}, NT-corrected u at "
        f"{NLAYERS} tau x 4 phi) -> {cols_per_s:.2f} columns/s/chip")
    return cols_per_s


def bench_reference():
    """Reference columns/s on host CPU for the same config (1 column =
    128 sequential band solves), or None if unavailable."""
    try:
        sys.path.insert(0, "/root/reference/src")
        from PythonicDISORT import pydisort
    except Exception as e:
        log(f"reference unavailable: {e}")
        return None
    rng = np.random.default_rng(42)
    thickness = rng.uniform(0.05, 0.5, NLAYERS)
    tau = np.cumsum(thickness)
    omega = rng.uniform(0.3, 0.99, NLAYERS)
    g = rng.uniform(0.5, 0.85, NLAYERS)
    leg = g[:, None] ** np.arange(NQUAD + 1)[None, :]
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        pydisort(
            tau, omega, NQUAD, leg, 0.8, np.pi, 0.0,
            f_arr=leg[:, NQUAD], only_flux=True,
        )
    per_solve = (time.perf_counter() - t0) / n
    ref_cols_per_s = 1.0 / (per_solve * NBANDS)
    log(f"reference: {per_solve*1e3:.1f} ms/solve -> {ref_cols_per_s:.4f} columns/s")
    return ref_cols_per_s


def main():
    cols_per_s = bench_ours()
    intensity = None
    if os.environ.get("BENCH_INTENSITY", "1") == "1":
        try:
            intensity = bench_intensity()
        except Exception as e:
            log(f"intensity bench failed: {type(e).__name__}: {e}")
    ref = bench_reference()
    if ref is None:
        # BASELINE.md: flux-only+delta-M 16 layers NQuad=16 = 7.47 ms;
        # scale ~linearly in layers and ~x4 in quadrature work.
        ref = 1.0 / (0.00747 * (NLAYERS / 16) * 4 * NBANDS)
    # Algorithmic kernel FLOP per column (eig stage + block-Thomas at
    # 64 layers x 128 bands) — derivation in scripts/roofline.py.
    # r5: the H-carry BVP scheme and the 5-sweep Jacobi default REDUCE
    # the algorithmic work per column (3.876e9 -> 3.31e9), so
    # eff_tflops is not comparable across rounds at face value.
    kernel_flop_per_col = 3.31e9
    out = {
        "metric": "columns/s/chip (64 layers, NQuad=32, 128 bands, flux-only f32)",
        "value": round(cols_per_s, 3),
        "unit": "columns/s",
        "vs_baseline": round(cols_per_s / ref, 2),
        "eff_tflops": round(cols_per_s * kernel_flop_per_col / 1e12, 3),
    }
    if intensity is not None:
        out["intensity_cols_per_s"] = round(intensity, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
