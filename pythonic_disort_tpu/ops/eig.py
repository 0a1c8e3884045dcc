"""Symmetrized discrete-ordinates eigensolver.

The discrete-ordinates ODE system for one (Fourier mode, layer) has the
block coefficient matrix ``[[-alpha, -beta], [beta, alpha]]`` with

    alpha = M^-1 (D+ W - I),    beta = M^-1 D- W,

where ``M = diag(mu)``, ``W = diag(w)`` are the (positive) quadrature
nodes/weights of one hemisphere and ``D+``/``D-`` are *symmetric*
scattering kernels.  Its eigenpairs follow from the half-size product
``S = (alpha - beta)(alpha + beta)`` whose eigenvalues are ``K^2``.

The reference implementation diagonalizes ``S`` with LAPACK's general
nonsymmetric ``eig`` (reference ``_solve_for_gen_and_part_sols.py:181``),
which has no TPU/XLA lowering.  This module instead exploits the
similarity structure (Stamnes & Swanson 1981):

with ``c = diag(sqrt(w mu))`` and ``rho = diag(sqrt(w/mu))``,

    c (alpha - beta) c^-1 = rho ((D+ - D-) - W^-1) rho =: At   (symmetric)
    c (alpha + beta) c^-1 = rho ((D+ + D-) - W^-1) rho =: Bt   (symmetric)

so ``c S c^-1 = At Bt``.  For a physical medium (omega < 1) both ``-At``
and ``-Bt`` are positive definite, hence with the Cholesky factorization
``-Bt = L L^T`` the conjugation ``L^T (At Bt) L^-T = L^T (-At) L`` is
symmetric positive definite: one batched ``eigh`` (TPU-supported)
delivers ``K^2 > 0`` and orthonormal eigenvectors ``Z``.

Back-transforms (all triangular/diagonal, no general inverses):

    eigvecs of S:        X   = c^-1 L^-T Z            ("G+ + G-")
    second block:        Y   = -c^-1 L Z / K          ("G+ - G-")
    X^-1 (if needed):    P   = Z^T L^T c
    Y^-1 (if needed):    Q   = -diag(K) Z^T L^-1 c

The full 2N x 2N eigenvector matrix and its inverse are assembled from
these N x N blocks by the caller; eigenvector normalization is arbitrary
(it cancels against the boundary-value coefficients).

The no-scattering shortcut of the reference (``_solve_for_gen_and_part_
sols.py:162-169``) needs no special-casing here: with ``D = 0`` the
matrices collapse to diagonals and this path reproduces ``K = 1/mu``
and unit eigenvectors exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from .jacobi import jacobi_eigh, jacobi_eigh_lanes_raw, _use_pallas
from .lanes import (
    cholesky_lanes,
    cholesky_lanes_raw,
    triangular_solve_lanes,
    tri_solve_upper_raw,
    _to_lanes,
    _from_lanes,
)


def disort_eigh(Dp, Dm, mu, w, *, eigh_method: str = "jacobi"):
    """Eigenpairs of the discrete-ordinates system, batched.

    Parameters
    ----------
    Dp, Dm : (..., N, N) symmetric scattering kernels ``D+``, ``D-``
        (already including the omega/2 weighting).
    mu, w : (N,) positive hemisphere quadrature nodes and weights.

    Returns
    -------
    K : (..., N) positive eigenvalues (column order unspecified — the
        columns form a consistent basis; downstream BVP coefficients
        adapt to whatever the order is).
    X : (..., N, N) columns are eigenvectors of ``(alpha-beta)(alpha+beta)``
        (the ``G+ + G-`` block).
    Y : (..., N, N) the ``G+ - G-`` block, ``(alpha+beta) X / K``.
    P : (..., N, N) ``X^-1``.
    Q : (..., N, N) ``Y^-1``.
    """
    dtype = Dp.dtype
    n = Dp.shape[-1]
    rho = jnp.sqrt(w / mu).astype(dtype)            # (N,)
    c = jnp.sqrt(w * mu).astype(dtype)              # (N,)
    inv_mu_diag = jnp.diag((1.0 / mu).astype(dtype))

    outer_rho = rho[:, None] * rho[None, :]
    At = outer_rho * (Dp - Dm) - inv_mu_diag        # symmetric
    Bt = outer_rho * (Dp + Dm) - inv_mu_diag        # symmetric

    if eigh_method == "jacobi" and _use_pallas(n, dtype):
        # Fully fused VMEM kernel (ops/pallas_eig.py): Cholesky,
        # congruence, Jacobi and all back-transforms in one pass.
        K, V, Yr, Pr, Qr = _eig_fused(At, Bt)
    else:
        K, V, Yr, Pr, Qr = _eig_stage_jnp(At, Bt, eigh_method)

    # Diagonal similarity scalings back to the physical eigenbasis.
    X = V / c[:, None]
    Y = Yr / c[:, None]
    P = Pr * c[None, :]
    Q = Qr * c[None, :]
    return K, X, Y, P, Q


def _eig_stage_jnp(At, Bt, eigh_method="jacobi"):
    """Unfused eigen stage on padded-layout ``At``, ``Bt`` (..., N, N).

    Returns the raw ``(K, V, Yr, Pr, Qr)`` — the caller applies the
    diagonal ``c`` scalings.  This is the f64/CPU path and the autodiff
    fallback of the fused Pallas kernel.
    """
    dtype = At.dtype
    L = cholesky_lanes(-Bt)                         # -Bt = L L^T (SPD)
    # M_sym = L^T (-At) L, SPD with eigenvalues K^2
    M_sym = jnp.einsum("...ji,...jk,...kl->...il", L, -At, L)
    if eigh_method == "jacobi":
        # Batched-small-matrix path (ops/jacobi.py): ~10x faster than
        # XLA's eigh on TPU for the (modes x layers x batch) workload.
        # sort=False: eigen-column order is irrelevant downstream (the
        # BVP coefficients adapt), and the sort's take_along_axis
        # gather runs in the padded layout over the whole batch.
        K2, Z = jacobi_eigh(M_sym, sort=False)
    else:
        K2, Z = jnp.linalg.eigh(M_sym)
    K = jnp.sqrt(jnp.maximum(K2, jnp.finfo(dtype).tiny))

    # V = L^-T Z  (X before the 1/c row scale)
    V = triangular_solve_lanes(L, Z, True)

    # Yr = -L Z / K  (Y before the 1/c row scale)
    LZ = jnp.einsum("...ij,...jk->...ik", L, Z)
    Yr = -LZ / K[..., None, :]

    # Pr = Z^T L^T  (P = X^-1 before the c column scale)
    Pr = jnp.einsum("...ji,...kj->...ik", Z, L)

    # Qr = -K (L^-T Z)^T  (Q = Y^-1 before the c column scale)
    Qr = -K[..., :, None] * jnp.swapaxes(V, -1, -2)
    return K, V, Yr, Pr, Qr


def _eig_stage_lanes_jnp(At_l, Bt_l):
    """Unfused eigen stage on RAW lanes-layout ``At_l``, ``Bt_l``
    (n, n, B).  The jnp f64/CPU path of `disort_eigh_lanes`; same math
    as `_eig_stage_jnp` without any layout round-trips."""
    dtype = At_l.dtype
    L = cholesky_lanes_raw(-Bt_l)                   # -Bt = L L^T (SPD)
    T1 = jnp.einsum("ijb,jkb->ikb", -At_l, L)
    M = jnp.einsum("jib,jkb->ikb", L, T1)           # L^T (-At) L
    K2, Z = jacobi_eigh_lanes_raw(M)                # unsorted, lanes
    K = jnp.sqrt(jnp.maximum(K2, jnp.finfo(dtype).tiny))   # (n, B)
    V = tri_solve_upper_raw(L, Z)                   # L^-T Z
    LZ = jnp.einsum("ijb,jkb->ikb", L, Z)
    Yr = -LZ / K[None, :, :]
    Pr = jnp.einsum("jib,kjb->ikb", Z, L)           # Z^T L^T
    Qr = -K[:, None, :] * jnp.swapaxes(V, 0, 1)
    return K, V, Yr, Pr, Qr


def _eig_stage_ad(At, Bt):
    """AD-capable eigen stage on padded (..., n, n) layout.

    Built exclusively from stock JAX primitives plus the custom_jvp
    Jacobi wrapper, so BOTH forward- and reverse-mode autodiff work
    (the lanes kernels carry custom_vjp rules, which reject forward
    mode).  Serves as the tangent path of the fused Pallas kernels;
    its primal outputs match `_eig_stage_jnp` (same rotation schedule,
    unsorted column order)."""
    dtype = At.dtype
    L = jnp.linalg.cholesky(-Bt)
    M_sym = jnp.einsum("...ji,...jk,...kl->...il", L, -At, L)
    K2, Z = jacobi_eigh(M_sym, sort=False)
    K = jnp.sqrt(jnp.maximum(K2, jnp.finfo(dtype).tiny))
    V = lax.linalg.triangular_solve(
        L, Z, left_side=True, lower=True, transpose_a=True
    )
    LZ = jnp.einsum("...ij,...jk->...ik", L, Z)
    Yr = -LZ / K[..., None, :]
    Pr = jnp.einsum("...ji,...kj->...ik", Z, L)
    Qr = -K[..., :, None] * jnp.swapaxes(V, -1, -2)
    return K, V, Yr, Pr, Qr


@jax.custom_batching.custom_vmap
def _eig_fused_core(At, Bt):
    from .pallas_eig import eig_stage_lanes_pallas

    n = At.shape[-1]
    At_l, batch_shape = _to_lanes(At)
    Bt_l, _ = _to_lanes(Bt)
    K, V, Yr, Pr, Qr = eig_stage_lanes_pallas(At_l, Bt_l)
    unl = lambda x: _from_lanes(x, batch_shape)
    Kp = jnp.moveaxis(K, -1, 0).reshape(batch_shape + (n,))
    return Kp, unl(V), unl(Yr), unl(Pr), unl(Qr)


@_eig_fused_core.def_vmap
def _eig_fused_vmap(axis_size, in_batched, At, Bt):
    # The core flattens all leading axes into the lane batch; mapped
    # axes just ride along.  Broadcast an unbatched operand explicitly.
    def bc(x, batched):
        return x if batched else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

    out = _eig_fused_core(bc(At, in_batched[0]), bc(Bt, in_batched[1]))
    return out, (True,) * 5


@jax.custom_jvp
def _eig_fused(At, Bt):
    """AD wrapper: tangents route through the jnp stage (each of whose
    building blocks carries its own custom JVP/VJP rules)."""
    return _eig_fused_core(At, Bt)


@_eig_fused.defjvp
def _eig_fused_jvp(primals, tangents):
    # NOTE: must be _eig_stage_ad, not _eig_stage_jnp — the lanes
    # kernels inside the latter carry custom_vjp rules, and forward-mode
    # autodiff of a custom_vjp function raises.
    return jax.jvp(_eig_stage_ad, primals, tangents)


@jax.custom_jvp
def _eig_lanes(At_l, Bt_l):
    """Eigen stage on RAW lanes operands (n, n, B); AD routes through
    the padded `_eig_stage_ad` with layout conversions at the boundary
    (tangent-path only — the primal never leaves lanes layout)."""
    n = At_l.shape[0]
    if _use_pallas(n, At_l.dtype):
        from .pallas_eig import eig_stage_lanes_pallas

        return eig_stage_lanes_pallas(At_l, Bt_l)
    return _eig_stage_lanes_jnp(At_l, Bt_l)


@_eig_lanes.defjvp
def _eig_lanes_jvp(primals, tangents):
    At_l, Bt_l = primals
    dAt_l, dBt_l = tangents
    to_p = lambda x: jnp.moveaxis(x, -1, 0)         # (n, n, B) -> (B, n, n)
    out, dout = jax.jvp(
        _eig_stage_ad, (to_p(At_l), to_p(Bt_l)), (to_p(dAt_l), to_p(dBt_l))
    )

    def back(x):
        return jnp.moveaxis(x, 0, -1)

    return tuple(back(x) for x in out), tuple(back(x) for x in dout)


def disort_eigh_lanes(Dp_l, Dm_l, mu, w):
    """`disort_eigh` on RAW lanes-layout scattering kernels.

    ``Dp_l``, ``Dm_l``: (N, N, B) symmetric kernels (omega/2-weighted);
    ``mu``, ``w``: (N,).  Returns ``(K (N, B), X, Y, P, Q (N, N, B))``
    entirely in lanes layout — the production batched solve
    (`models/disort/batch_solve.py`) uses this to keep the whole
    pipeline out of the padded (…, N, N) layout.  Same math as
    `disort_eigh` (reference ``_solve_for_gen_and_part_sols.py:181``).
    """
    dtype = Dp_l.dtype
    rho = jnp.sqrt(w / mu).astype(dtype)            # (N,)
    c = jnp.sqrt(w * mu).astype(dtype)              # (N,)
    outer_rho = (rho[:, None] * rho[None, :])[:, :, None]
    inv_mu_diag = jnp.diag((1.0 / mu).astype(dtype))[:, :, None]

    At_l = outer_rho * (Dp_l - Dm_l) - inv_mu_diag
    Bt_l = outer_rho * (Dp_l + Dm_l) - inv_mu_diag

    K, V, Yr, Pr, Qr = _eig_lanes(At_l, Bt_l)
    # Diagonal similarity scalings back to the physical eigenbasis:
    # rows scale by 1/c for X/Y, columns by c for P/Q.
    X = V / c[:, None, None]
    Y = Yr / c[:, None, None]
    P = Pr * c[None, :, None]
    Q = Qr * c[None, :, None]
    return K, X, Y, P, Q
