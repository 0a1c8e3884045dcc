"""Measure dispatch/IO overlap of the chunked sweep (BASELINE north
star: overlap layer-coupled solves with eigendecomposition compute).

A TPU core executes one program at a time, so the exploitable overlap
is between device execution and everything host-side: dispatch, result
fetch, and (in the sweep driver) shard writing.  The double-buffered
pattern (`parallel/sweep.py`) keeps the device queue non-empty while
the host drains results.  This script quantifies it on the real chip:

- ``serialized``: dispatch chunk, fetch its scalar, repeat (device
  idles during every host round trip);
- ``pipelined``: dispatch all chunks back-to-back, then fetch (the
  sweep driver's pattern; host round trips overlap device compute).

Also attempts a `jax.profiler` trace of the pipelined run (works on a
locally attached chip; through the remote axon tunnel the device-side
trace may be empty, in which case the wall-clock ratio stands as the
evidence).  Run: ``python scripts/overlap_measure.py``.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench import build_batch, CHUNK_COLS, NBANDS
from pythonic_disort_tpu.parallel import solve_fluxes

N_CHUNKS = int(os.environ.get("OVERLAP_CHUNKS", 8))


def main():
    problem, tau_eval = build_batch(jnp.float32, CHUNK_COLS)

    def step(problem, tau_eval):
        fup, fdn, fdir = solve_fluxes(problem, tau_eval)
        return fup.sum() + fdn.sum() + fdir.sum()

    fused = jax.jit(step)
    float(np.asarray(fused(problem, tau_eval)))        # compile

    def serialized():
        t0 = time.perf_counter()
        for _ in range(N_CHUNKS):
            float(np.asarray(fused(problem, tau_eval)))
        return time.perf_counter() - t0

    def pipelined():
        t0 = time.perf_counter()
        outs = [fused(problem, tau_eval) for _ in range(N_CHUNKS)]
        for o in outs:
            float(np.asarray(o))
        return time.perf_counter() - t0

    t_ser = min(serialized() for _ in range(3))
    t_pipe = min(pipelined() for _ in range(3))
    saved = 1.0 - t_pipe / t_ser
    print(f"chunks={N_CHUNKS} cols/chunk={CHUNK_COLS} bands={NBANDS}")
    print(f"serialized (device idles per host RTT): {t_ser*1e3:.1f} ms")
    print(f"pipelined  (sweep-driver pattern):      {t_pipe*1e3:.1f} ms")
    print(f"overlap recovers {saved*100:.1f}% of serialized wall time "
          f"({N_CHUNKS} host round trips hidden behind device compute)")

    trace_dir = os.environ.get("OVERLAP_TRACE_DIR", "/tmp/pdt_trace")
    try:
        with jax.profiler.trace(trace_dir):
            pipelined()
        n = sum(len(fs) for _, _, fs in os.walk(trace_dir))
        print(f"profiler trace written: {trace_dir} ({n} files)")
    except Exception as e:
        print(f"profiler trace unavailable through this runtime: "
              f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
