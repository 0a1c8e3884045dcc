"""Pallas TPU kernel: the ENTIRE discrete-ordinates eigen stage, fused.

Round-2 profiling showed `disort_eigh` (`ops/eig.py`) running at ~2x the
time of its Jacobi kernel alone: the Cholesky factorization, the
``M = L^T (-At) L`` congruence, the triangular back-substitutions and
the X/Y/P/Q assembly all executed as separate XLA programs — each a
full HBM pass over (n, n, B) tensors (the lanes `fori_loop` kernels in
`ops/lanes.py` re-read their whole operand every elimination step), plus
lanes<->padded layout round-trips between them.

This kernel performs the complete stage per lane block while the block
is VMEM-resident:

    load At, Bt (2 HBM reads)
      L    = cholesky(-Bt)                 (16-step fori, VMEM)
      M    = L^T (-At) L                   (row-outer contractions, VMEM)
      K2,Z = jacobi(M)                     (shared sweep code, VMEM)
      K    = sqrt(max(K2, tiny))
      V    = L^-T Z                        (back-substitution, VMEM)
      Yr   = -(L Z) / K
      Pr   = Z^T L^T
      Qr   = -K_row * V^T
    store K, V, Yr, Pr, Qr (5 HBM writes)

The diagonal ``c = sqrt(w mu)`` scalings that turn (V, Yr, Pr, Qr) into
the (X, Y, P, Q) of `ops/eig.py` stay OUTSIDE the kernel: they are
elementwise in lanes layout and XLA fuses them into the consumers, and
keeping them out spares the kernel a vector operand.

All contractions are 16-step ``fori_loop``s of (n, n, blk) fused
multiply-adds — row/column slices with one dynamic index, the shape
Mosaic compiles quickly and runs at VPU speed (see the compile-time
discipline note in docs/performance.md).

Replaces (with `ops/eig.py`) the reference's per-(mode, layer)
``np.linalg.eig`` loop, reference ``_solve_for_gen_and_part_sols.py:181``.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from .jacobi import default_sweeps
from .pallas_jacobi import (
    _partner_perms, jacobi_sweeps, lanes_eye, onesided_sweeps,
)

LANE_BLOCK = 128


def _contract_jk(A, B, n):
    """Σ_j A[:, j, :] ⊗ B[j, :, :]  — einsum('ijb,jkb->ikb').

    Static unrolled k-loop on VMEM values (the `pallas_blocktri` matmul
    idiom); Mosaic has no dynamic_slice on values, and at n = 16 the
    unroll is compile-cheap.
    """
    acc = A[:, 0, :][:, None, :] * B[0][None]
    for j in range(1, n):
        acc = acc + A[:, j, :][:, None, :] * B[j][None]
    return acc


def _contract_ji(A, B, n):
    """Σ_j A[j, :, :] ⊗ B[j, :, :]  — einsum('jib,jkb->ikb') (A^T B)."""
    acc = A[0][:, None, :] * B[0][None]
    for j in range(1, n):
        acc = acc + A[j][:, None, :] * B[j][None]
    return acc


def _contract_jj(A, B, n):
    """Σ_j A[:, j, :] ⊗ B[:, j, :]  — einsum('ijb,kjb->ikb') (A B^T)."""
    acc = A[:, 0, :][:, None, :] * B[:, 0, :][None]
    for j in range(1, n):
        acc = acc + A[:, j, :][:, None, :] * B[:, j, :][None]
    return acc


def _cholesky_vmem(Bm, n, blk):
    """Lower Cholesky factor of SPD ``Bm`` (n, n, blk), VMEM-resident.

    ``fori_loop`` with iota-compare masked row/column extraction (the
    Mosaic-supported substitute for dynamic slices; see
    ``pallas_blocktri._gauss_jordan_vmem``).
    """
    row2 = lax.broadcasted_iota(jnp.int32, (n, blk), 0)
    col3 = lax.broadcasted_iota(jnp.int32, (n, n, blk), 1)
    zero = jnp.zeros((), Bm.dtype)

    def body(k, carry):
        a, Lf = carry
        colmask = col3 == k
        colk = jnp.sum(jnp.where(colmask, a, zero), axis=1)     # (n, blk)
        akk = jnp.sum(jnp.where(row2 == k, colk, zero), axis=0)  # (blk,)
        col = jnp.where(row2 >= k, colk / jnp.sqrt(akk)[None, :], zero)
        a = a - col[:, None, :] * col[None, :, :]
        Lf = jnp.where(colmask, col[:, None, :], Lf)
        return a, Lf

    _, L = lax.fori_loop(
        jnp.int32(0), jnp.int32(n), body, (Bm, jnp.zeros_like(Bm))
    )
    return L


def _trisolve_upper_vmem(L, Z, n, blk):
    """Back-substitution ``L^T X = Z`` on VMEM values; X (n, n, blk)."""
    row2 = lax.broadcasted_iota(jnp.int32, (n, blk), 0)
    row3 = lax.broadcasted_iota(jnp.int32, (n, n, blk), 0)
    col3 = lax.broadcasted_iota(jnp.int32, (n, n, blk), 1)
    zero = jnp.zeros((), L.dtype)

    def body(i, X):
        k = jnp.int32(n - 1) - i
        Lcol = jnp.sum(jnp.where(col3 == k, L, zero), axis=1)    # (n, blk)
        # X rows <= k are still zero, so the full sum only picks up j > k
        acc = jnp.sum(Lcol[:, None, :] * X, axis=0)              # (n, blk)
        bk = jnp.sum(jnp.where(row3 == k, Z, zero), axis=0)      # (n, blk)
        lkk = jnp.sum(jnp.where(row2 == k, Lcol, zero), axis=0)  # (blk,)
        xk = (bk - acc) / lkk[None, :]
        return jnp.where(row3 == k, xk[None], X)

    return lax.fori_loop(jnp.int32(0), jnp.int32(n), body, jnp.zeros_like(Z))


def _eig_fused_kernel(at_ref, bt_ref, k_ref, v_ref, y_ref, p_ref, q_ref,
                      *, n, sweeps, perms, onesided=False):
    A = -at_ref[:]                                      # (n, n, blk) SPD
    blk = A.shape[-1]
    dtype = A.dtype
    eye = lanes_eye(n, blk, dtype)

    L = _cholesky_vmem(-bt_ref[:], n, blk)

    # M = L^T A L  (congruence; SPD with eigenvalues K^2)
    T1 = _contract_jk(A, L, n)
    M = _contract_ji(L, T1, n)

    if onesided:
        # one-sided Jacobi on the rows of chol(M): row-only rotations,
        # no transposes/resymmetrize (see pallas_jacobi.onesided_sweeps)
        C = _cholesky_vmem(M, n, blk)
        K2, wv = onesided_sweeps(C, n=n, sweeps=sweeps, perms=perms, eye=eye)
    else:
        M, wv = jacobi_sweeps(M, n=n, sweeps=sweeps, perms=perms, eye=eye)
        K2 = jnp.sum(M * eye, axis=1)                   # (n, blk)
    K = jnp.sqrt(jnp.maximum(K2, jnp.finfo(dtype).tiny))

    Z = jnp.swapaxes(wv, 0, 1)                          # wv = Z^T
    V = _trisolve_upper_vmem(L, Z, n, blk)              # L^-T Z
    LZ = _contract_jk(L, Z, n)

    k_ref[:] = K
    v_ref[:] = V                                        # X = V / c_row
    y_ref[:] = -LZ / K[None, :, :]                      # Y = y / c_row
    # P = Z^T L^T = (L Z)^T: reuse LZ instead of a second 16-step
    # contraction (one transpose vs n FMA passes).
    p_ref[:] = jnp.swapaxes(LZ, 0, 1)                   # P = p * c_col
    q_ref[:] = -K[:, None, :] * jnp.swapaxes(V, 0, 1)   # Q = q * c_col


def eig_stage_lanes_pallas(At, Bt, sweeps=None):
    """Fused eigen stage on lanes-layout ``At``, ``Bt`` (n, n, B).

    Returns ``(K, V, Yr, Pr, Qr)`` — see module docstring for the
    diagonal ``c`` scalings the caller applies.  ``B`` is padded
    internally to a lane-block multiple (pad entries solve the identity
    problem, which is SPD and convergent).
    """
    n, _, B = At.shape
    dtype = At.dtype
    if sweeps is None:
        sweeps = default_sweeps(n, dtype)
    blk = LANE_BLOCK
    Bp = ((B + blk - 1) // blk) * blk
    if Bp != B:
        pad = jnp.broadcast_to(
            -jnp.eye(n, dtype=dtype)[:, :, None], (n, n, Bp - B)
        )
        At = jnp.concatenate([At, pad], axis=-1)
        Bt = jnp.concatenate([Bt, pad], axis=-1)

    # One-sided Jacobi default on (opt out: PYDISORT_TPU_EIG_ONESIDED=0;
    # trace-time knob like PYDISORT_TPU_PALLAS — see config.set_kernel_flags
    # docs): ~6% end-to-end headline, full 53-test TPU certification green,
    # and relative accuracy in the small-K limit.
    kernel = functools.partial(
        _eig_fused_kernel, n=n, sweeps=sweeps, perms=_partner_perms(n),
        onesided=os.environ.get("PYDISORT_TPU_EIG_ONESIDED", "1") == "1",
    )
    z = np.int32(0)
    mat_spec = pl.BlockSpec((n, n, blk), lambda i: (z, z, i),
                            memory_space=pltpu.VMEM)
    vec_spec = pl.BlockSpec((n, blk), lambda i: (z, i),
                            memory_space=pltpu.VMEM)
    mat_shape = jax.ShapeDtypeStruct((n, n, Bp), dtype)
    K, V, Yr, Pr, Qr = pl.pallas_call(
        kernel,
        grid=(Bp // blk,),
        in_specs=[mat_spec, mat_spec],
        out_specs=[vec_spec, mat_spec, mat_spec, mat_spec, mat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, Bp), dtype),
            mat_shape, mat_shape, mat_shape, mat_shape,
        ],
    )(At, Bt)
    if Bp != B:
        K, V, Yr, Pr, Qr = (
            K[..., :B], V[..., :B], Yr[..., :B], Pr[..., :B], Qr[..., :B]
        )
    return K, V, Yr, Pr, Qr
