"""Scaling-efficiency measurement: columns/s on 1 vs N devices.

North-star target (BASELINE.json): >= 85% columns/s scaling efficiency
from 1 chip to N hosts.  The batch (columns x bands) axis is sharded
over the mesh and the interior solve is collective-free, so the
expected efficiency on real multi-chip hardware is ~1.

Modes:
- **Real multi-device** (len(jax.devices()) > 1 on TPU): measure
  in-process over 1, 2, ..., N chips.
- **Single-chip / CPU fallback**: no second chip exists, so the script
  re-execs itself once per device count on a virtual CPU mesh
  (``--xla_force_host_platform_device_count``) with the process pinned
  to that many physical cores (``taskset``), making "1 device" ~= "1
  core" a fair weak-scaling proxy.  The JSON marks this with
  ``"cpu_proxy": true``; device counts are capped at the core count.

Prints one JSON line with per-device-count columns/s and efficiency.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure(nd):
    """Columns/s for one device count on the current backend."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bench import build_batch, NBANDS, CHUNK_COLS
    from pythonic_disort_tpu.parallel import solve_fluxes_sharded

    devices = jax.devices()
    assert len(devices) >= nd, (len(devices), nd)
    ncols = CHUNK_COLS * nd               # weak scaling: fixed work per device
    problem, tau_eval = build_batch(jnp.float32, ncols)
    mesh = Mesh(np.asarray(devices[:nd]), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))
    problem = jax.tree.map(lambda x: jax.device_put(x, sharding), problem)
    tau_eval = jax.device_put(tau_eval, sharding)

    def step(problem, tau_eval):
        fup, fdn, fdir = solve_fluxes_sharded(problem, tau_eval, mesh)
        return fup.sum() + fdn.sum() + fdir.sum()

    fused = jax.jit(step)
    float(np.asarray(fused(problem, tau_eval)))    # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fused(problem, tau_eval)))
        ts.append(time.perf_counter() - t0)
    cols_per_s = ncols / min(ts)
    log(f"{nd} device(s): {cols_per_s:.2f} columns/s ({ncols} cols x {NBANDS} bands)")
    return cols_per_s


def emit(results, cpu_proxy, audit=None, samples=None, ncores=None,
         distributed=None, load_balance=None):
    counts = sorted(results)
    base = results[counts[0]]
    # Ideal throughput for nd devices: nd x base while each virtual
    # device owns a physical core; beyond the core count the proxy is
    # compute-limited at ncores x base, so efficiency for oversubscribed
    # counts measures DECOMPOSITION OVERHEAD of the nd-way sharded
    # program against the core-limited ideal (honest on a small VM; on
    # real multi-chip hardware every device owns its own chip).
    def ideal(nd):
        lim = nd if ncores is None else min(nd, ncores)
        return base * lim

    eff = {nd: results[nd] / ideal(nd) for nd in counts}
    out = {
        "metric": "columns/s scaling efficiency (weak scaling)",
        "columns_per_s": {str(k): round(v, 3) for k, v in results.items()},
        "efficiency": {str(k): round(v, 4) for k, v in eff.items()},
        "cpu_proxy": cpu_proxy,
        "unit": "fraction",
        "value": round(min(eff.values()), 4),
    }
    if ncores is not None:
        out["physical_cores"] = ncores
        out["oversubscribed_counts"] = [nd for nd in counts if nd > ncores]
    if audit is not None:
        out["interior_collectives_8way"] = audit
    if distributed is not None:
        out["distributed_cluster"] = distributed
    if load_balance is not None:
        out["load_balance_8shard"] = load_balance
    if samples is not None:
        out["samples_columns_per_s"] = samples
    if cpu_proxy:
        out["notes"] = (
            "Single real TPU chip available; numbers are the core-pinned "
            "virtual-CPU-mesh proxy (1 device ~= 1 core, median of "
            f"{len(next(iter(samples.values()))) if samples else '?'} "
            "passes). Counts above the physical core count run "
            "oversubscribed and are scored against the core-limited "
            "ideal (base x ncores), i.e. they measure the sharded "
            "program's decomposition overhead. The sharded production "
            "program compiles with ZERO interior collectives (audit "
            "above): on real multi-chip hardware scaling is bounded by "
            "load balance, not communication."
        )
    print(json.dumps(out))


def audit_collectives(nd):
    """Compile the sharded production program for ``nd`` devices and
    count collective ops in the optimized HLO.  The interior solve is
    collective-free by design — scaling efficiency on real hardware is
    then bounded only by load balance, not communication."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from bench import build_batch
    from pythonic_disort_tpu.parallel import solve_fluxes_sharded

    devices = jax.devices()[:nd]
    problem, tau_eval = build_batch(jnp.float32, nd)
    mesh = Mesh(np.asarray(devices), ("batch",))
    lowered = jax.jit(
        lambda p, t: solve_fluxes_sharded(p, t, mesh)
    ).lower(problem, tau_eval)
    hlo = lowered.compile().as_text()
    counts = {}
    for op in ("all-reduce", "all-gather", "all-to-all",
               "collective-permute", "reduce-scatter"):
        counts[op] = sum(
            1 for line in hlo.splitlines()
            if f"{op}-start" in line or (f" {op}(" in line) or
            line.lstrip().startswith(f"%{op}")
        )
    return counts


def measure_shard_balance(nshards, reps=5):
    """Per-shard step-time spread at ``nshards`` shards.

    The 8-way sharded HLO contains zero interior collectives (see
    `audit_collectives`), so on real multi-chip hardware scaling is
    bounded ONLY by load balance across shards.  This makes that bound
    a number: each shard's local program (identical static shapes —
    the solve has no data-dependent work) is timed separately under
    identical conditions; ``max/mean`` of per-shard best times is the
    worst-case efficiency loss a synchronized step would see.
    """
    import jax
    import jax.numpy as jnp

    from bench import build_batch
    from pythonic_disort_tpu.parallel import solve_fluxes

    ncols = 2 * nshards            # 2 cols/shard: ~3 s per CPU step
    problem, tau_eval = build_batch(jnp.float32, ncols)
    B = problem.tau_arr.shape[0]
    per = B // nshards

    def step(p, t):
        fup, fdn, fdir = solve_fluxes(p, t)
        return fup.sum() + fdn.sum() + fdir.sum()

    fused = jax.jit(step)
    shards = [
        (jax.tree.map(lambda x: x[i * per:(i + 1) * per], problem),
         tau_eval[i * per:(i + 1) * per])
        for i in range(nshards)
    ]
    float(np.asarray(fused(*shards[0])))           # compile once
    best = [np.inf] * nshards
    for _ in range(reps):
        for i, (p, t) in enumerate(shards):
            t0 = time.perf_counter()
            float(np.asarray(fused(p, t)))
            best[i] = min(best[i], time.perf_counter() - t0)
    mean_t = float(np.mean(best))
    return {
        "nshards": nshards,
        "per_shard_best_s": [round(float(x), 4) for x in best],
        "max_over_mean": round(float(np.max(best)) / mean_t, 4),
        "balance_efficiency": round(mean_t / float(np.max(best)), 4),
    }


def measure_distributed_worker(coordinator, nprocs, pid):
    """Worker for the cross-process throughput measurement: a real
    ``jax.distributed`` cluster (the single-machine analogue of
    multi-host DCN), one virtual CPU device per process, each process
    core-pinned by the launcher.  Times the shard_map production step
    over the process-spanning mesh and prints the per-rep wall time."""
    import jax

    from pythonic_disort_tpu.parallel import initialize_distributed

    initialize_distributed(
        coordinator_address=coordinator, num_processes=nprocs,
        process_id=pid,
    )
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from bench import build_batch, CHUNK_COLS

    ndev = len(jax.devices())
    assert ndev == nprocs, (ndev, nprocs)
    ncols = CHUNK_COLS * nprocs                  # weak scaling
    problem, tau_eval = build_batch(jnp.float32, ncols)
    mesh = Mesh(np.asarray(jax.devices()), ("batch",))
    sharding = NamedSharding(mesh, P("batch"))

    def shard(x):
        return jax.make_array_from_callback(
            x.shape, sharding, lambda idx: np.asarray(x)[idx]
        )

    from pythonic_disort_tpu.parallel import solve_fluxes_sharded

    problem_sh = jax.tree.map(shard, problem)
    tau_sh = shard(tau_eval)

    def step(p, t):
        fup, fdn, fdir = solve_fluxes_sharded(p, t, mesh)
        return fup.sum() + fdn.sum() + fdir.sum()

    fused = jax.jit(step)
    float(np.asarray(fused(problem_sh, tau_sh)))         # compile
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(np.asarray(fused(problem_sh, tau_sh)))
        ts.append(time.perf_counter() - t0)
    print(f"DRESULT {min(ts)} {ncols}", flush=True)


def measure_distributed(nprocs, passes=3):
    """Launch an ``nprocs``-process jax.distributed cluster (1 virtual
    CPU device per process, each pinned to its own core) and return
    columns/s of the production step across the real process boundary."""
    import socket
    import subprocess

    best = []
    for _ in range(passes):
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        coordinator = f"127.0.0.1:{port}"
        procs = []
        for pid in range(nprocs):
            env = dict(os.environ)
            env.pop("JAX_PLATFORMS", None)
            env["JAX_PLATFORM_NAME"] = "cpu"
            env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
            cmd = ["taskset", "-c", str(pid % (os.cpu_count() or 1)),
                   sys.executable, os.path.abspath(__file__), "--dworker",
                   coordinator, str(nprocs), str(pid)]
            procs.append(subprocess.Popen(
                cmd, env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True, cwd=os.path.dirname(os.path.abspath(__file__)),
            ))
        times, ncols = [], None
        for p in procs:
            out, err = p.communicate(timeout=900)
            if p.returncode != 0:
                raise RuntimeError(f"worker failed: {err[-2000:]}")
            for line in out.splitlines():
                if line.startswith("DRESULT "):
                    _, t, nc = line.split()
                    times.append(float(t))
                    ncols = int(nc)
        assert len(times) == nprocs and ncols is not None
        best.append(ncols / max(times))
    cols_per_s = float(np.median(best))
    log(f"distributed {nprocs}-process cluster: {cols_per_s:.3f} columns/s "
        f"(samples {[round(x, 3) for x in best]})")
    return cols_per_s, best


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        # Inner invocation: measure a single device count, print cols/s.
        nd = int(sys.argv[2])
        print(f"RESULT {measure(nd)}", flush=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--audit":
        nd = int(sys.argv[2])
        print(f"AUDIT {json.dumps(audit_collectives(nd))}", flush=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--shardtime":
        print(f"SHARDS {json.dumps(measure_shard_balance(int(sys.argv[2])))}",
              flush=True)
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--dworker":
        measure_distributed_worker(
            sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
        )
        return

    import jax

    devices = jax.devices()
    if len(devices) > 1 and devices[0].platform != "cpu":
        counts = sorted({1, 2, len(devices)} & set(range(1, len(devices) + 1)))
        log(f"real mesh: {len(devices)} x {devices[0].platform}")
        emit({nd: measure(nd) for nd in counts}, cpu_proxy=False)
        return

    # Single-chip / CPU: re-exec per count, pinned to min(nd, ncores)
    # cores.  Counts above the core count still run (the nd-way sharded
    # program on all cores) and are scored against the core-limited
    # ideal — see emit().
    ncores = os.cpu_count() or 1
    counts = [1, 2, 4, 8]
    passes = int(os.environ.get("SCALING_PASSES", 5))
    log(f"cpu proxy mesh: {ncores} cores -> counts {counts}, {passes} passes")

    def run_sub(mode, nd, cores):
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        env["JAX_PLATFORM_NAME"] = "cpu"
        env["XLA_FLAGS"] = (
            env.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={nd}"
        )
        cmd = [sys.executable, os.path.abspath(__file__), mode, str(nd)]
        if cores:
            cmd = ["taskset", "-c", cores] + cmd
        out = subprocess.run(
            cmd, env=env, capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return out.stdout

    # measured per-core throughput, median over passes (small shared VMs
    # show ~±20% run-to-run noise)
    samples = {nd: [] for nd in counts}
    for _ in range(passes):
        for nd in counts:
            cores = ",".join(str(c) for c in range(min(nd, ncores)))
            for line in run_sub("--one", nd, cores).splitlines():
                if line.startswith("RESULT "):
                    samples[nd].append(float(line.split()[1]))
    results = {nd: float(np.median(v)) for nd, v in samples.items()}

    # compiler-level audit: count collectives in the 8-way sharded HLO
    audit = None
    for line in run_sub("--audit", max(8, counts[-1]), None).splitlines():
        if line.startswith("AUDIT "):
            audit = json.loads(line[len("AUDIT "):])
    log(f"interior collective audit (8-way): {audit}")

    # per-shard load-balance at 8 shards (one pinned core so the
    # number reflects shard-work spread, not scheduler noise)
    balance = None
    try:
        out8 = subprocess.run(
            ["taskset", "-c", "0", sys.executable,
             os.path.abspath(__file__), "--shardtime", "8"],
            env={**os.environ, "JAX_PLATFORM_NAME": "cpu"},
            capture_output=True, text=True, check=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        ).stdout
        for line in out8.splitlines():
            if line.startswith("SHARDS "):
                balance = json.loads(line[len("SHARDS "):])
    except Exception as e:
        balance = {"error": f"{type(e).__name__}: {e}"}
    log(f"8-shard load balance: {balance}")

    # throughput across a REAL process boundary (2-process
    # jax.distributed cluster; r3 only checked correctness there)
    dist = None
    try:
        nd_procs = min(2, ncores)
        # 1-process cluster baseline through the SAME code path, so the
        # efficiency ratio includes coordination-service overhead on
        # both sides (apples-to-apples across the process boundary).
        base_s, bsamples = measure_distributed(1, passes=3)
        cols_s, dsamples = measure_distributed(nd_procs, passes=3)
        dist = {
            "processes": nd_procs,
            "columns_per_s": round(cols_s, 3),
            "samples": [round(x, 3) for x in dsamples],
            "baseline_1proc_columns_per_s": round(base_s, 3),
            "baseline_samples": [round(x, 3) for x in bsamples],
            "efficiency": round(cols_s / (base_s * nd_procs), 4),
        }
    except Exception as e:                       # never lose the main artifact
        dist = {"error": f"{type(e).__name__}: {e}"}
    emit(results, cpu_proxy=True, audit=audit, load_balance=balance,
         samples={str(k): [round(x, 3) for x in v]
                  for k, v in samples.items()},
         ncores=ncores, distributed=dist)


if __name__ == "__main__":
    main()
