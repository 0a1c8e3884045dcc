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

from .batch import solve_fluxes
from .mesh import shard_batch


class SweepDriver:
    """Run a chunked flux sweep with resumable output shards."""

    def __init__(self, out_dir, chunk_size, mesh=None):
        self.out_dir = out_dir
        self.chunk_size = int(chunk_size)
        self.mesh = mesh
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
        """
        times = {}
        n_chunks = (n_total + self.chunk_size - 1) // self.chunk_size
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
            fup, fdn, fdir = solve_fluxes(problem, tau_eval)
            jax.block_until_ready((fup, fdn, fdir))
            dt = time.perf_counter() - t0
            np.savez(
                path,
                flux_up=np.asarray(fup),
                flux_down_diffuse=np.asarray(fdn),
                flux_down_direct=np.asarray(fdir),
                start=start, stop=stop,
            )
            self.manifest["chunks"][key] = "done"
            self._save_manifest()
            times[ci] = dt
        return times

    def gather(self):
        """Concatenate all finished chunks in index order."""
        outs = {"flux_up": [], "flux_down_diffuse": [], "flux_down_direct": []}
        for ci in sorted(int(k) for k, v in self.manifest["chunks"].items() if v == "done"):
            with np.load(os.path.join(self.out_dir, f"chunk_{ci}.npz")) as z:
                for k in outs:
                    outs[k].append(z[k])
        return {k: np.concatenate(v, axis=0) for k, v in outs.items() if v}
