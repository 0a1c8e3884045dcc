"""Pallas TPU kernel: batched Jacobi eigendecomposition, VMEM-resident.

The jnp batch-in-lanes Jacobi (`ops/jacobi.py`) round-trips the matrix
and eigenvector arrays through HBM on every rotation round (~3 full
passes x 90 rounds).  This kernel keeps one lane-block of matrices
**resident in VMEM for the entire iteration**: per grid step a
``(n, n, BLK)`` block is loaded once, swept ``sweeps`` times, and
written back once.  HBM traffic drops from ~270 passes to 2.

Kernel design (this shape is what makes the Mosaic compile tractable —
a naive port of the lanes rotation needs hundreds of single-sublane
slice/concat shuffles per round and compiles for >10 minutes):

- One rotation round applies n/2 disjoint Givens rotations.  Writing
  the round ROW-WISE, every row ``i`` is paired with ``partner(i)``
  (a static involution) and updates as ``c_i * A_i - s_i * A_partner``
  where ``(c_i, s_i)`` come from per-row closed forms of the classic
  pivot formulas (for the q-member of a pair, ``theta`` and hence ``s``
  flip sign, which is exactly the sign its row update needs).  A row
  permutation of ``(n, n, BLK)`` along dim 0 moves whole (n, BLK)
  planes — no sublane shuffles.
- The two-sided update ``A <- J^T A J`` uses symmetry: with
  ``T = J^T A`` (one row pass), ``A_next = (J^T T^T)^T`` — and since
  ``A_next`` is symmetric we can skip the outer transpose and apply
  the SAME row pass to ``T^T``.  One transpose per round total.
- Eigenvectors accumulate TRANSPOSED (``W = V^T``, ``W <- J^T W``):
  pure row passes, zero transposes; the caller un-transposes once.
- Pivot quantities are diagonals: ``app = diag(A)``,
  ``aqq = diag(A)[partner]``, ``apq = diag(P A)`` — masked sublane
  reductions, no element gathers.

Layout: input must already be in lanes layout ``(n, n, B)``;
`ops/jacobi.py` handles padding, dispatch and the final sort.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .jacobi import _round_robin_schedule

LANE_BLOCK = 512


def _partner_perms(n):
    """Static per-round partner involutions: perm[i] = pair partner."""
    p_sched, q_sched = _round_robin_schedule(n)
    perms = []
    for r in range(n - 1):
        perm = np.arange(n)
        for p, q in zip(p_sched[r], q_sched[r]):
            perm[p], perm[q] = q, p
        perms.append(tuple(int(x) for x in perm))
    return perms


def _perm0(x, perm):
    """Permute along dim 0 (whole-plane moves; no sublane shuffles)."""
    return jnp.concatenate([x[i:i + 1] for i in perm], axis=0)


def lanes_eye(n, blk, dtype):
    """(n, n, blk) identity stack (2-D iota; 1-D iota is not legal on TPU)."""
    row = lax.broadcasted_iota(jnp.int32, (n, n, blk), 0)
    col = lax.broadcasted_iota(jnp.int32, (n, n, blk), 1)
    return jnp.where(row == col, jnp.ones((), dtype), jnp.zeros((), dtype))


def jacobi_sweeps(a0, *, n, sweeps, perms, eye=None):
    """Run ``sweeps`` Jacobi sweeps on VMEM values ``a0`` (n, n, blk).

    Returns ``(a, wv)`` where ``diag(a)`` holds the eigenvalues and
    ``wv = V^T`` the transposed accumulated eigenvectors.  Shared by the
    standalone Jacobi kernel and the fused eigendecomposition kernel
    (`ops/pallas_eig.py`).
    """
    blk = a0.shape[-1]
    dtype = a0.dtype
    if eye is None:
        eye = lanes_eye(n, blk, dtype)
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    def one_sweep(_, carry):
        a, wv, d = carry
        # Re-symmetrize once per sweep: roundoff asymmetry otherwise
        # feeds the per-row pivot reads below and compounds into
        # ~1e-4 eigenvector orthogonality error over ~90 rounds.
        a = 0.5 * (a + jnp.swapaxes(a, 0, 1))
        for perm in perms:
            pa = _perm0(a, perm)                        # rows of the partner
            offd = jnp.sum(pa * eye, axis=1)            # apq per row
            # Partner-average the off-diagonal pivot: row p reads
            # A[q,p], row q reads A[p,q]; averaging makes the (c, s)
            # pair exactly consistent for both pair members, so each
            # rotation stays orthogonal to f32 roundoff.
            offd = 0.5 * (offd + _perm0(offd, perm))
            dp = _perm0(d, perm)
            theta = (dp - d) * 0.5
            denom = jnp.abs(theta) + jnp.sqrt(theta * theta + offd * offd)
            # theta == 0 EXACTLY is poison for the row-wise update: the
            # q-member's t must be -t_p, which normally falls out of
            # theta_q = -theta_p, but a tied pair sees theta = +0 on
            # BOTH rows and `theta >= 0` hands both the SAME sign —
            # a non-orthogonal "rotation" that corrupts the lane beyond
            # repair (~1 matrix per ~1e5 random inputs; found by a
            # 131072-lane reconstruction scan in r5).  SKIP tied pairs
            # (t = 0): the round-robin schedule revisits the pair next
            # sweep, by which time other rotations have moved the
            # carried diagonals apart.  (A static per-round ±role
            # tie-break would rotate immediately, but every iota/concat
            # encoding of it trips Mosaic internal checks.)
            sgn = jnp.where(theta >= 0, one, -one)
            t = jnp.where(
                (jnp.abs(offd) > 0) & (theta != 0),
                sgn * offd / jnp.where(denom > 0, denom, one),
                zero,
            )
            # Mosaic lowers lax.rsqrt to the fast approximate VPU
            # intrinsic (seed ~7-8 bits), which makes the rotations
            # visibly non-orthogonal (measured 1.8e-3 end-to-end flux
            # error vs 2.3e-4 on the jnp path).  Two Newton-Raphson
            # refinements restore full f32 accuracy at negligible cost
            # (one leaves ~1.5e-4 orthogonality error that accumulates
            # across the ~90 rotation rounds).
            x = 1.0 + t * t
            c = lax.rsqrt(x)
            c = c * (1.5 - 0.5 * x * c * c)
            c = c * (1.5 - 0.5 * x * c * c)
            s = t * c
            cb = c[:, None, :]
            sb = s[:, None, :]

            # Rotation updates the diagonal analytically (classic Jacobi
            # identity d_p' = d_p - t apq, d_q' = d_q + t apq; our
            # per-row t already carries the q-member's sign flip), so
            # the diag is CARRIED across rounds as an (n, blk) vector
            # instead of re-extracted from the (n, n, blk) matrix —
            # saves two full passes per round.  The carried value only
            # steers pivot angles; the final eigenvalues are read from
            # the actual matrix diagonal.
            d = d - t * offd

            # T = J^T A (row pass), then A_next = row pass on T^T
            t1 = cb * a - sb * pa
            t1t = jnp.swapaxes(t1, 0, 1)
            a = cb * t1t - sb * _perm0(t1t, perm)

            # W = V^T accumulates with the same row pass
            wv = cb * wv - sb * _perm0(wv, perm)
        return a, wv, d

    # int32 bounds: under global x64 mode a Python-int fori index would
    # become int64, which Mosaic does not support.
    d0 = jnp.sum(a0 * eye, axis=1)
    a, wv, _ = lax.fori_loop(
        jnp.int32(0), jnp.int32(sweeps), one_sweep, (a0, eye, d0)
    )
    return a, wv


def onesided_sweeps(c0, *, n, sweeps, perms, eye=None):
    """One-sided Jacobi on the rows of ``c0`` (n, n, blk).

    For SPD ``M = C C^T`` (``C`` the lower Cholesky factor), the rows
    of ``C`` are the columns of a factor ``W`` with ``M = W^T W``;
    orthogonalizing them by plane rotations computes the SVD
    ``W V = U diag(sigma)`` whose accumulated ``V`` is the eigenvector
    matrix of ``M`` and ``sigma^2`` its eigenvalues.  Per round this
    needs only ROW passes — one partner permute + Gram-dot reduce +
    one FMA for C, one permute + FMA for V^T — with NO transpose and
    NO re-symmetrization (the Gram pivot sigma_pq is computed
    identically by both pair members, so the rotations are exactly
    consistent), ~5.5 tensor passes/round vs the two-sided kernel's ~8.
    One-sided Jacobi also has RELATIVE accuracy in the small singular
    values — the omega -> 1 limit where K -> 0.

    Returns ``(k2, wv)``: the eigenvalues of ``M`` (n, blk) and
    ``wv = V^T``.
    """
    blk = c0.shape[-1]
    dtype = c0.dtype
    if eye is None:
        eye = lanes_eye(n, blk, dtype)
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)

    def one_sweep(_, carry):
        c, wv, nrm = carry
        for perm in perms:
            pc = _perm0(c, perm)                        # partner rows
            offd = jnp.sum(c * pc, axis=1)              # sigma_pq per row
            pnrm = _perm0(nrm, perm)
            theta = (pnrm - nrm) * 0.5
            denom = jnp.abs(theta) + jnp.sqrt(theta * theta + offd * offd)
            # theta == 0 tie: same poison as the two-sided kernel (both
            # pair members would get the same rotation sign) — skip the
            # pair this round; see jacobi_sweeps.
            sgn = jnp.where(theta >= 0, one, -one)
            t = jnp.where(
                (jnp.abs(offd) > 0) & (theta != 0),
                sgn * offd / jnp.where(denom > 0, denom, one),
                zero,
            )
            x = 1.0 + t * t
            cth = lax.rsqrt(x)
            cth = cth * (1.5 - 0.5 * x * cth * cth)
            cth = cth * (1.5 - 0.5 * x * cth * cth)
            s = t * cth
            cb = cth[:, None, :]
            sb = s[:, None, :]
            # carried row-norms^2 update (same 2x2 diagonalization
            # identity as the two-sided diag carry)
            nrm = nrm - t * offd
            c = cb * c - sb * pc
            wv = cb * wv - sb * _perm0(wv, perm)
        return c, wv, nrm

    nrm0 = jnp.sum(c0 * c0, axis=1)
    c, wv, _ = lax.fori_loop(
        jnp.int32(0), jnp.int32(sweeps), one_sweep, (c0, eye, nrm0)
    )
    # eigenvalues from the ACTUAL final rows (the carried norms only
    # steer the pivot angles)
    k2 = jnp.sum(c * c, axis=1)
    return k2, wv


def _jacobi_kernel(a_ref, w_ref, v_ref, *, n, sweeps, perms):
    a0 = a_ref[:]                                       # (n, n, blk)
    eye = lanes_eye(n, a0.shape[-1], a0.dtype)
    a, wv = jacobi_sweeps(a0, n=n, sweeps=sweeps, perms=perms, eye=eye)
    w_ref[:] = jnp.sum(a * eye, axis=1)
    v_ref[:] = wv                                       # = V^T


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

    kernel = functools.partial(
        _jacobi_kernel, n=n, sweeps=sweeps, perms=_partner_perms(n)
    )
    # index maps: int32 constants (Python 0 traces as i64 under global
    # x64 mode, which Mosaic cannot legalize)
    z = np.int32(0)
    w, Vt = pl.pallas_call(
        kernel,
        grid=(Bp // blk,),
        in_specs=[
            pl.BlockSpec((n, n, blk), lambda i: (z, z, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n, blk), lambda i: (z, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n, n, blk), lambda i: (z, z, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, Bp), At.dtype),
            jax.ShapeDtypeStruct((n, n, Bp), At.dtype),
        ],
    )(At)
    # kernel returns V^T; undo outside (XLA transpose, once)
    return w[:, :B], jnp.swapaxes(Vt, 0, 1)[:, :, :B]
