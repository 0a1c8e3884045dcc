"""On-chip microbenchmarks for the two hot Pallas kernels.

Times variants at the PRODUCTION footprint (small-shape timings
mislead — see .claude/skills/verify):

- fused eigen stage: 131072 matrices of 16x16 (the bench config's
  Q = NF * L * S with NF=1, L=64, S=2048)
- block-Thomas BVP:  (L=64, 2N=32, 2N=32, B=2048)

Knobs swept: lane-block widths of both kernels, Jacobi sweep count.
Run: ``python scripts/kernel_tune.py`` (needs the TPU chip).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PYDISORT_TPU_NO_X64", "1")

import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, *args, reps=5, inner=8):
    """Per-call device time via an ON-DEVICE repeat loop.

    The remote axon runtime costs ~33 ms per host<->device round trip
    and ~1-2 ms per queued dispatch (measured), which swamps ms-scale
    kernels; a `lax.fori_loop` re-running the kernel ``inner`` times in
    ONE dispatch amortizes that away.  The carried scalar perturbs the
    first operand so XLA cannot hoist the loop-invariant call.
    """
    from jax import lax

    def repeat(s0, *args):
        def body(_, carry):
            s, a0 = carry
            out = fn(a0, *args[1:])
            s2 = sum(x.sum() for x in jax.tree.leaves(out)).astype(jnp.float32)
            return s2, args[0] + 0.0 * s2
        s, _ = lax.fori_loop(0, inner, body, (s0, args[0]))
        return s

    rfn = jax.jit(repeat)
    z = jnp.float32(0.0)
    float(np.asarray(rfn(z, *args)))          # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(np.asarray(rfn(z, *args)))
        ts.append(time.perf_counter() - t0)
    overhead = 0.033                           # measured round-trip floor
    return max(min(ts) - overhead, 1e-9) / inner


def bench_eig(lane_block=None, sweeps=None):
    from pythonic_disort_tpu.ops import pallas_eig, pallas_jacobi

    if lane_block is not None:
        pallas_eig.LANE_BLOCK = lane_block
    n, B = 16, 131072
    rng = np.random.default_rng(0)
    M = rng.standard_normal((B, n, n)).astype(np.float32)
    spd = -(M @ M.transpose(0, 2, 1) + 3 * n * np.eye(n, dtype=np.float32))
    At = jnp.asarray(np.moveaxis(spd, 0, -1))
    Bt = jnp.asarray(np.moveaxis(spd * 1.1, 0, -1))

    fn = jax.jit(
        lambda a, b: pallas_eig.eig_stage_lanes_pallas(a, b, sweeps=sweeps)
    )
    t = timeit(fn, At, Bt)
    label = f"eig blk={pallas_eig.LANE_BLOCK} sweeps={sweeps or 'default'}"
    print(f"{label}: {t*1e3:.1f} ms")
    return t


def bench_blocktri(lane_block=None):
    from pythonic_disort_tpu.ops import pallas_blocktri

    if lane_block is not None:
        orig = pallas_blocktri._lane_block
        pallas_blocktri._lane_block = lambda n: lane_block
    L, n, B = 64, 32, 2048
    rng = np.random.default_rng(1)
    diag = rng.standard_normal((L, n, n, B)).astype(np.float32)
    diag += (5 * n * np.eye(n, dtype=np.float32))[None, :, :, None]
    lower = 0.1 * rng.standard_normal((L, n, n, B)).astype(np.float32)
    upper = 0.1 * rng.standard_normal((L, n, n, B)).astype(np.float32)
    rhs = rng.standard_normal((L, n, B)).astype(np.float32)
    args = tuple(map(jnp.asarray, (lower, diag, upper, rhs)))

    fn = jax.jit(pallas_blocktri.solve_block_tridiag_lanes_pallas)
    t = timeit(fn, *args)
    blk = lane_block or pallas_blocktri._lane_block(n)
    print(f"blocktri blk={blk}: {t*1e3:.1f} ms")
    if lane_block is not None:
        pallas_blocktri._lane_block = orig
    return t


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("devices:", jax.devices())
    if which in ("all", "eig"):
        for blk in (512, 1024, 2048):
            try:
                bench_eig(lane_block=blk)
            except Exception as e:
                print(f"eig blk={blk}: FAILED {type(e).__name__}: {e}")
    if which in ("all", "sweeps"):
        for sw in (6, 5, 4):
            bench_eig(lane_block=512, sweeps=sw)
    if which in ("all", "blocktri"):
        for blk in (128, 256, 512):
            try:
                bench_blocktri(lane_block=blk)
            except Exception as e:
                print(f"blocktri blk={blk}: FAILED {type(e).__name__}: {e}")
