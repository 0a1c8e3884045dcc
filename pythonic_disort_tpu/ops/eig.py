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

import jax.numpy as jnp
from jax import lax

from .jacobi import jacobi_eigh
from .lanes import cholesky_lanes, triangular_solve_lanes


def disort_eigh(Dp, Dm, mu, w, *, eigh_method: str = "jacobi"):
    """Eigenpairs of the discrete-ordinates system, batched.

    Parameters
    ----------
    Dp, Dm : (..., N, N) symmetric scattering kernels ``D+``, ``D-``
        (already including the omega/2 weighting).
    mu, w : (N,) positive hemisphere quadrature nodes and weights.

    Returns
    -------
    K : (..., N) positive eigenvalues, ascending.
    X : (..., N, N) columns are eigenvectors of ``(alpha-beta)(alpha+beta)``
        (the ``G+ + G-`` block).
    Y : (..., N, N) the ``G+ - G-`` block, ``(alpha+beta) X / K``.
    P : (..., N, N) ``X^-1``.
    Q : (..., N, N) ``Y^-1``.
    """
    dtype = Dp.dtype
    rho = jnp.sqrt(w / mu).astype(dtype)            # (N,)
    c = jnp.sqrt(w * mu).astype(dtype)              # (N,)
    inv_mu_diag = jnp.diag((1.0 / mu).astype(dtype))

    outer_rho = rho[:, None] * rho[None, :]
    At = outer_rho * (Dp - Dm) - inv_mu_diag        # symmetric
    Bt = outer_rho * (Dp + Dm) - inv_mu_diag        # symmetric

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

    # X = c^-1 L^-T Z  (solve L^T V = Z), then scale rows by 1/c
    V = triangular_solve_lanes(L, Z, True)
    X = V / c[:, None]

    # Y = -c^-1 L Z / K
    LZ = jnp.einsum("...ij,...jk->...ik", L, Z)
    Y = -(LZ / c[:, None]) / K[..., None, :]

    # P = X^-1 = Z^T L^T c
    P = jnp.einsum("...ji,...kj->...ik", Z, L) * c[None, :]

    # Q = Y^-1 = -K Z^T L^-1 c = -K (L^-T Z)^T c, reusing V = L^-T Z
    Q = -K[..., :, None] * jnp.swapaxes(V, -1, -2) * c[None, :]

    return K, X, Y, P, Q
