"""Batch-in-lanes dense linear algebra for tiny matrices.

Same design as `ops/jacobi.py` / `ops/blocktri.py`: XLA's stock
``cholesky`` / ``triangular_solve`` are latency- and padding-bound on
huge batches of tiny matrices (trailing dims pad to the 128-lane TPU
tile).  These kernels flatten every leading batch axis into the lane
dimension — layout ``(n, m, B)`` — so each factorization/substitution
step is an elementwise op across the whole batch.

Each public op carries:
- a ``custom_vmap`` rule folding mapped axes into the lane batch, and
- a ``custom_vjp`` (reverse-mode) rule using the standard matrix
  calculus identities, expressed in terms of the same lanes ops.

AD order: FIRST-order forward and reverse differentiation is fully
supported through the whole solve (`tests/test_grad.py`); second-order
(grad-of-grad) stops at these ``custom_vjp`` rules — their residual
closures call the non-differentiable ``custom_vmap`` cores, which JAX
cannot linearize a second time.  (The reference's
``autograd_compatible`` mode is likewise first-order.)  Retrieval-style
Hessians should use Gauss–Newton products of first-order Jacobians.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax


def _to_lanes(x):
    """(..., n, m) -> ((n, m, B), batch_shape)."""
    n, m = x.shape[-2:]
    batch_shape = x.shape[:-2]
    return jnp.moveaxis(x.reshape((-1, n, m)), 0, -1), batch_shape


def _from_lanes(x, batch_shape):
    return jnp.moveaxis(x, -1, 0).reshape(batch_shape + x.shape[:-1])


# ---------------------------------------------------------------- cholesky

@jax.custom_vjp
def cholesky_lanes(A):
    """Lower Cholesky factor of SPD ``A`` (..., n, n), batched."""
    return _cholesky_core(A)


def cholesky_lanes_raw(At):
    """Lower Cholesky factor on a RAW lanes-layout operand (n, n, B).

    Forward-only building block (no AD/vmap rules) for callers that
    already hold lanes-layout data (`models/disort/batch_solve.py`);
    `cholesky_lanes` wraps it for padded (..., n, n) operands.
    """
    n = At.shape[0]

    def body(k, carry):
        a, Lf = carry
        akk = lax.dynamic_slice(a, (k, k, 0), (1, 1, a.shape[-1]))[0, 0]
        pivot = jnp.sqrt(akk)
        colk = lax.dynamic_slice_in_dim(a, k, 1, axis=1)[:, 0, :]  # (n, B)
        mask = (jnp.arange(n)[:, None] >= k).astype(a.dtype)
        col = mask * colk / pivot[None, :]
        a = a - col[:, None, :] * col[None, :, :]
        Lf = lax.dynamic_update_slice_in_dim(Lf, col[:, None, :], k, axis=1)
        return a, Lf

    _, Lf = lax.fori_loop(0, n, body, (At, jnp.zeros_like(At)))
    return Lf


@jax.custom_batching.custom_vmap
def _cholesky_core(A):
    At, batch_shape = _to_lanes(A)
    return _from_lanes(cholesky_lanes_raw(At), batch_shape)


@_cholesky_core.def_vmap
def _cholesky_vmap(axis_size, in_batched, A):
    del axis_size, in_batched
    return _cholesky_core(A), True


def _cholesky_fwd(A):
    L = _cholesky_core(A)
    return L, L


def _cholesky_bwd(L, Lbar):
    # Standard Cholesky pullback: Abar = 0.5 L^-T Phi(L^T Lbar) L^-1,
    # Phi(X) = tril(X) with halved diagonal; symmetrized.
    n = L.shape[-1]
    W = jnp.einsum("...ji,...jk->...ik", L, Lbar)
    tril = jnp.tril(jnp.ones((n, n), L.dtype))
    Phi = W * (tril - 0.5 * jnp.eye(n, dtype=L.dtype))
    tmp = triangular_solve_lanes(L, jnp.swapaxes(Phi, -1, -2), transpose=True)
    Abar = triangular_solve_lanes(L, jnp.swapaxes(tmp, -1, -2), transpose=True)
    return (0.5 * (Abar + jnp.swapaxes(Abar, -1, -2)),)


cholesky_lanes.defvjp(_cholesky_fwd, _cholesky_bwd)


# ---------------------------------------------------------- triangular solve

@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def triangular_solve_lanes(L, B, transpose=False):
    """Solve ``L X = B`` (or ``L^T X = B``) with ``L`` lower triangular.

    ``L``: (..., n, n); ``B``: (..., n, m).  Static ``transpose``.
    """
    return _tri_solve_core(L, B, transpose)


def _tri_solve_core(L, B, transpose):
    if transpose:
        return _tri_solve_upper(L, B)
    return _tri_solve_lower(L, B)


def tri_solve_lower_raw(Lt, Bt):
    """Solve ``L X = B`` on RAW lanes operands ``Lt`` (n, n, B),
    ``Bt`` (n, m, B).  Forward-only building block."""
    n = Lt.shape[0]

    def body(k, X):
        Lrow = lax.dynamic_slice_in_dim(Lt, k, 1, axis=0)[0]   # (n, nb)
        acc = jnp.einsum("jb,jmb->mb", Lrow, X)                # uses X[j<k]
        bk = lax.dynamic_slice_in_dim(Bt, k, 1, axis=0)[0]     # (m, nb)
        lkk = lax.dynamic_slice(Lt, (k, k, 0), (1, 1, Lt.shape[-1]))[0, 0]
        xk = (bk - acc) / lkk[None, :]
        return lax.dynamic_update_slice_in_dim(X, xk[None], k, axis=0)

    return lax.fori_loop(0, n, body, jnp.zeros_like(Bt))


@jax.custom_batching.custom_vmap
def _tri_solve_lower(L, B):
    Lt, batch_shape = _to_lanes(L)
    Bt, _ = _to_lanes(B)
    return _from_lanes(tri_solve_lower_raw(Lt, Bt), batch_shape)


@_tri_solve_lower.def_vmap
def _tri_solve_lower_vmap(axis_size, in_batched, L, B):
    del axis_size, in_batched
    return _tri_solve_lower(L, B), True


def tri_solve_upper_raw(Lt, Bt):
    """Solve ``L^T X = B`` (back substitution) on RAW lanes operands."""
    n = Lt.shape[0]

    def body(i, X):
        k = n - 1 - i
        Lcol = lax.dynamic_slice_in_dim(Lt, k, 1, axis=1)[:, 0, :]  # (n, nb)
        acc = jnp.einsum("jb,jmb->mb", Lcol, X)                # uses X[j>k]
        bk = lax.dynamic_slice_in_dim(Bt, k, 1, axis=0)[0]
        lkk = lax.dynamic_slice(Lt, (k, k, 0), (1, 1, Lt.shape[-1]))[0, 0]
        xk = (bk - acc) / lkk[None, :]
        return lax.dynamic_update_slice_in_dim(X, xk[None], k, axis=0)

    return lax.fori_loop(0, n, body, jnp.zeros_like(Bt))


@jax.custom_batching.custom_vmap
def _tri_solve_upper(L, B):
    """Solve ``L^T X = B`` (back substitution)."""
    Lt, batch_shape = _to_lanes(L)
    Bt, _ = _to_lanes(B)
    return _from_lanes(tri_solve_upper_raw(Lt, Bt), batch_shape)


@_tri_solve_upper.def_vmap
def _tri_solve_upper_vmap(axis_size, in_batched, L, B):
    del axis_size, in_batched
    return _tri_solve_upper(L, B), True


def _tri_solve_fwd(L, B, transpose):
    X = _tri_solve_core(L, B, transpose)
    return X, (L, X)


def _tri_solve_bwd(transpose, res, Xbar):
    L, X = res
    # For L X = B: Bbar = L^-T Xbar; Lbar = -tril(Bbar X^T).
    # For L^T X = B: Bbar = L^-1 Xbar; Lbar = -tril(X Bbar^T).
    Bbar = _tri_solve_core(L, Xbar, not transpose)
    n = L.shape[-1]
    tril = jnp.tril(jnp.ones((n, n), L.dtype))
    if transpose:
        Lbar = -tril * jnp.einsum("...im,...jm->...ij", X, Bbar)
    else:
        Lbar = -tril * jnp.einsum("...im,...jm->...ij", Bbar, X)
    return Lbar, Bbar


triangular_solve_lanes.defvjp(_tri_solve_fwd, _tri_solve_bwd)
