"""Pallas TPU kernel: batched Jacobi eigendecomposition, VMEM-resident.

The jnp batch-in-lanes Jacobi (`ops/jacobi.py`) still round-trips the
matrix and eigenvector arrays through HBM on every rotation round
(~3 full passes x 90 rounds).  This kernel keeps one lane-block of
matrices **resident in VMEM for the entire iteration**: per grid step a
``(n, n, BLK)`` block is loaded once, swept ``sweeps`` times with all
rotation rounds unrolled (static round-robin schedule, slice/concat
permutations only — no gathers), and written back once.  HBM traffic
drops from ~270 passes to 2.

Layout: input must already be in lanes layout ``(n, n, B)`` with ``B``
a multiple of the lane block; `ops/jacobi.py` handles padding, dispatch
(TPU only) and the final eigenvalue sort.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jacobi import _round_robin_schedule, _inv_perm

LANE_BLOCK = 512


def _take0(x, idxs):
    return jnp.concatenate([x[i:i + 1] for i in idxs], axis=0)


def _take1(x, idxs):
    return jnp.concatenate([x[:, i:i + 1] for i in idxs], axis=1)


def _jacobi_kernel(a_ref, w_ref, v_ref, *, n, sweeps, rounds):
    a0 = a_ref[:]                                       # (n, n, blk)
    blk = a0.shape[-1]
    dtype = a0.dtype
    row = lax.broadcasted_iota(jnp.int32, (n, n, blk), 0)
    col = lax.broadcasted_iota(jnp.int32, (n, n, blk), 1)
    v0 = jnp.where(row == col, jnp.ones((), dtype), jnp.zeros((), dtype))

    def one_sweep(_, carry):
        a, v = carry
        for pj, qj, inv in rounds:
            app = jnp.concatenate([a[p:p + 1, p, :] for p in pj], 0)
            aqq = jnp.concatenate([a[q:q + 1, q, :] for q in qj], 0)
            apq = jnp.concatenate(
                [a[p:p + 1, q, :] for p, q in zip(pj, qj)], 0
            )                                           # (n/2, blk)
            theta = (aqq - app) * 0.5
            denom = jnp.abs(theta) + jnp.sqrt(theta * theta + apq * apq)
            sgn = jnp.where(theta >= 0, 1.0, -1.0).astype(dtype)
            t = jnp.where(
                jnp.abs(apq) > 0,
                sgn * apq / jnp.where(denom > 0, denom, 1.0),
                jnp.zeros_like(apq),
            )
            c = 1.0 / jnp.sqrt(1.0 + t * t)
            s = t * c

            crow = c[:, None, :]
            srow = s[:, None, :]
            Ap = _take0(a, pj)
            Aq = _take0(a, qj)
            a = _take0(
                jnp.concatenate(
                    [crow * Ap - srow * Aq, srow * Ap + crow * Aq], 0
                ),
                inv,
            )
            ccol = c[None, :, :]
            scol = s[None, :, :]
            Ap = _take1(a, pj)
            Aq = _take1(a, qj)
            a = _take1(
                jnp.concatenate(
                    [ccol * Ap - scol * Aq, scol * Ap + ccol * Aq], 1
                ),
                inv,
            )
            Vp = _take1(v, pj)
            Vq = _take1(v, qj)
            v = _take1(
                jnp.concatenate(
                    [ccol * Vp - scol * Vq, scol * Vp + ccol * Vq], 1
                ),
                inv,
            )
        return a, v

    # int32 bounds: under global x64 mode a Python-int fori index would
    # become int64, which Mosaic does not support.
    a, v = lax.fori_loop(
        jnp.int32(0), jnp.int32(sweeps), one_sweep, (a0, v0)
    )
    w_ref[:] = jnp.concatenate([a[i:i + 1, i, :] for i in range(n)], 0)
    v_ref[:] = v


def jacobi_eigh_lanes_pallas(At, sweeps):
    """Run the kernel on ``At`` (n, n, B); returns (w (n, B), V (n, n, B)).

    ``B`` is padded internally to a multiple of the lane block.
    """
    n, _, B = At.shape
    blk = LANE_BLOCK
    Bp = ((B + blk - 1) // blk) * blk
    if Bp != B:
        pad = jnp.broadcast_to(
            jnp.eye(n, dtype=At.dtype)[:, :, None], (n, n, Bp - B)
        )
        At = jnp.concatenate([At, pad], axis=-1)

    p_sched, q_sched = _round_robin_schedule(n)
    rounds = tuple(
        (tuple(int(x) for x in p_sched[r]),
         tuple(int(x) for x in q_sched[r]),
         tuple(int(x) for x in _inv_perm(p_sched[r], q_sched[r], n)))
        for r in range(n - 1)
    )
    kernel = functools.partial(
        _jacobi_kernel, n=n, sweeps=sweeps, rounds=rounds
    )
    w, V = pl.pallas_call(
        kernel,
        grid=(Bp // blk,),
        in_specs=[
            pl.BlockSpec((n, n, blk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, blk), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, blk), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, Bp), At.dtype),
            jax.ShapeDtypeStruct((n, n, Bp), At.dtype),
        ],
    )(At)
    return w[:, :B], V[:, :, :B]
