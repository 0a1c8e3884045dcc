"""Chunked, resumable sweep driver for pod-scale runs.

The checkpoint/resume subsystem of this framework (SURVEY section 5):
solves are milliseconds, so instead of a training-style checkpointer
the unit of durability is an output shard.  A sweep over a large
(columns x bands) batch is split into chunks; each chunk's fluxes are
written to ``<out_dir>/chunk_<i>.npz`` with a manifest recording
completion.  Restarting skips finished chunks.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import jax

from .batch import solve_fluxes, solve_fluxes_sharded
from .mesh import shard_batch


class SweepDriver:
    """Run a chunked flux sweep with resumable output shards.

    Chunks are **double-buffered** (``overlap=True``): chunk ``k+1`` is
    dispatched to the device before chunk ``k``'s results are fetched
    and written, so host-side IO (result transfer + npz write, the
    dominant per-chunk host cost through a remote TPU runtime) overlaps
    device execution.  This is the pipeline-overlap role of the
    BASELINE north star at program granularity: a TPU core executes one
    program at a time, so cross-stage overlap (eigendecomposition of
    chunk k+1 against the layer-coupled solve of chunk k) happens by
    keeping the device queue non-empty, while intra-chunk overlap is
    XLA's instruction scheduler (measured: fused solve+flux program
    runs ~4% faster than the sum of its isolated stages).
    """

    def __init__(self, out_dir, chunk_size, mesh=None, overlap=True):
        self.out_dir = out_dir
        self.chunk_size = int(chunk_size)
        self.mesh = mesh
        self.overlap = overlap
        if mesh is None:
            self._step = jax.jit(solve_fluxes)
        else:
            self._step = jax.jit(
                lambda p, t: solve_fluxes_sharded(p, t, mesh)
            )
        os.makedirs(out_dir, exist_ok=True)
        self.manifest_path = os.path.join(out_dir, "manifest.json")
        self.manifest = self._load_manifest()

    def _load_manifest(self):
        if os.path.exists(self.manifest_path):
            with open(self.manifest_path) as f:
                return json.load(f)
        return {"chunks": {}}

    def _save_manifest(self):
        tmp = self.manifest_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.manifest, f)
        os.replace(tmp, self.manifest_path)

    def run(self, problem_for_chunk, tau_eval_for_chunk, n_total):
        """Sweep ``n_total`` batch elements.

        ``problem_for_chunk(start, stop)`` must return the batched
        problem for that half-open index range; likewise
        ``tau_eval_for_chunk``.  Returns per-chunk wall times.

        NOTE (timing semantics with ``overlap=True``): ``times[ci]``
        spans chunk ``ci``'s dispatch until its drain, which happens
        after chunk ``ci+1`` has been dispatched — adjacent intervals
        overlap and are NOT additive; ``sum(times.values())`` is not
        the sweep wall time (use an outer timer for that).  With
        ``overlap=False`` each entry is an isolated dispatch-to-sync
        wall time and the entries are additive. (ADVICE r2 item 5)
        """
        times = {}
        n_chunks = (n_total + self.chunk_size - 1) // self.chunk_size
        pending = None                     # (ci, start, stop, outs, t0)

        def drain(p):
            ci, start, stop, (fup, fdn, fdir), t0 = p
            np.savez(
                os.path.join(self.out_dir, f"chunk_{ci}.npz"),
                flux_up=np.asarray(fup),
                flux_down_diffuse=np.asarray(fdn),
                flux_down_direct=np.asarray(fdir),
                start=start, stop=stop,
            )
            self.manifest["chunks"][str(ci)] = "done"
            self._save_manifest()
            times[ci] = time.perf_counter() - t0

        for ci in range(n_chunks):
            key = str(ci)
            path = os.path.join(self.out_dir, f"chunk_{ci}.npz")
            if self.manifest["chunks"].get(key) == "done" and os.path.exists(path):
                continue
            start = ci * self.chunk_size
            stop = min(start + self.chunk_size, n_total)
            problem = problem_for_chunk(start, stop)
            tau_eval = tau_eval_for_chunk(start, stop)
            if self.mesh is not None:
                problem = shard_batch(problem, self.mesh)
                tau_eval = shard_batch(tau_eval, self.mesh)
            t0 = time.perf_counter()
            outs = self._step(problem, tau_eval)   # async dispatch
            if self.overlap:
                if pending is not None:
                    drain(pending)         # host IO overlaps device exec
                pending = (ci, start, stop, outs, t0)
            else:
                jax.block_until_ready(outs)
                drain((ci, start, stop, outs, t0))
        if pending is not None:
            drain(pending)
        return times

    def gather(self):
        """Concatenate all finished chunks in index order."""
        outs = {"flux_up": [], "flux_down_diffuse": [], "flux_down_direct": []}
        for ci in sorted(int(k) for k, v in self.manifest["chunks"].items() if v == "done"):
            with np.load(os.path.join(self.out_dir, f"chunk_{ci}.npz")) as z:
                for k in outs:
                    outs[k].append(z[k])
        return {k: np.concatenate(v, axis=0) for k, v in outs.items() if v}
