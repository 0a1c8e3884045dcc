"""Scaling-efficiency measurement: columns/s on 1 vs N devices.

North-star target (BASELINE.json): >= 85% columns/s scaling efficiency
from 1 chip to N hosts.  On a multi-chip/multi-host system this runs as
is (after ``initialize_distributed``); on a single-chip or CPU machine
set ``JAX_PLATFORMS=cpu`` with
``XLA_FLAGS=--xla_force_host_platform_device_count=8`` to validate the
sharded program and measure the parallel fraction on a faked mesh.

Prints one JSON line with per-device-count columns/s and efficiency.
"""

import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bench import build_batch, NBANDS, CHUNK_COLS
    from pythonic_disort_tpu.parallel import solve_fluxes

    devices = jax.devices()
    counts = sorted({1, 2, len(devices)} & set(range(1, len(devices) + 1)))
    log(f"devices: {len(devices)} x {devices[0].platform}")

    results = {}
    for nd in counts:
        ncols = CHUNK_COLS * nd           # weak scaling: fixed work per device
        problem, tau_eval = build_batch(jnp.float32, ncols)
        mesh = Mesh(np.asarray(devices[:nd]), ("batch",))
        sharding = NamedSharding(mesh, P("batch"))
        problem = jax.tree.map(lambda x: jax.device_put(x, sharding), problem)
        tau_eval = jax.device_put(tau_eval, sharding)

        def step(problem, tau_eval):
            fup, fdn, fdir = solve_fluxes(problem, tau_eval)
            return fup.sum() + fdn.sum() + fdir.sum()

        fused = jax.jit(step)
        float(np.asarray(fused(problem, tau_eval)))    # compile
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(fused(problem, tau_eval)))
            ts.append(time.perf_counter() - t0)
        cols_per_s = ncols / min(ts)
        results[nd] = cols_per_s
        log(f"{nd} device(s): {cols_per_s:.2f} columns/s ({ncols} cols x {NBANDS} bands)")

    base = results[counts[0]]
    eff = {
        nd: results[nd] / (base * nd) for nd in counts
    }
    print(json.dumps({
        "metric": "columns/s scaling efficiency (weak scaling)",
        "columns_per_s": {str(k): round(v, 3) for k, v in results.items()},
        "efficiency": {str(k): round(v, 4) for k, v in eff.items()},
        "unit": "fraction",
        "value": round(eff[counts[-1]], 4),
    }))


if __name__ == "__main__":
    main()
