"""Block-tridiagonal solver (block Thomas algorithm) via ``lax.scan``.

The multi-layer boundary-value system of the discrete-ordinates method
couples the per-layer coefficient vectors through layer-interface
continuity conditions; regrouping its rows in chunks of ``2N`` makes it
block tridiagonal with ``2N x 2N`` blocks.  The reference solves the
same system with a scalar banded LU (``scipy.linalg.solve_banded``,
reference ``_solve_for_coeffs.py:326``) which has no XLA lowering; a
block Thomas recursion maps naturally onto TPU: each elimination step
is a batched small-matrix LU + matmuls (MXU work), with the serial
dimension being the (short) layer axis.

The exponential scaling of the assembled blocks (all entries bounded by
the eigenvector magnitudes; growth factors ``exp(K dtau)`` never appear
un-damped) keeps the recursion well conditioned, mirroring the
reference's banded assembly (``_solve_for_coeffs.py:264-273``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def solve_block_tridiag(lower, diag, upper, rhs):
    """Solve a block-tridiagonal system, batched.

    Block row ``l`` reads ``lower[l] x[l-1] + diag[l] x[l] + upper[l]
    x[l+1] = rhs[l]`` (``lower[0]`` and ``upper[-1]`` are ignored).

    Parameters
    ----------
    lower, diag, upper : (L, ..., B, B) block arrays; axis 0 is the
        serial (layer-chunk) axis, middle axes are batch.
    rhs : (L, ..., B)

    Returns
    -------
    x : (L, ..., B)
    """
    L = diag.shape[0]
    if L == 1:
        return jnp.linalg.solve(diag[0], rhs[0][..., None])[..., 0][None]

    # Forward elimination: W[l] = Dhat[l]^-1 U[l], g[l] = Dhat[l]^-1 rhat[l]
    def fwd(carry, inp):
        W_prev, g_prev = carry
        low, dia, upp, r = inp
        dhat = dia - jnp.einsum("...ij,...jk->...ik", low, W_prev)
        rhat = r - jnp.einsum("...ij,...j->...i", low, g_prev)
        aug = jnp.concatenate([upp, rhat[..., None]], axis=-1)
        sol = jnp.linalg.solve(dhat, aug)
        W = sol[..., :-1]
        g = sol[..., -1]
        return (W, g), (W, g)

    aug0 = jnp.concatenate([upper[0], rhs[0][..., None]], axis=-1)
    sol0 = jnp.linalg.solve(diag[0], aug0)
    W0, g0 = sol0[..., :-1], sol0[..., -1]
    (_, _), (Ws, gs) = lax.scan(
        fwd, (W0, g0), (lower[1:], diag[1:], upper[1:], rhs[1:])
    )
    Ws = jnp.concatenate([W0[None], Ws], axis=0)
    gs = jnp.concatenate([g0[None], gs], axis=0)

    # Back substitution: x[L-1] = g[L-1]; x[l] = g[l] - W[l] x[l+1]
    def bwd(x_next, inp):
        W, g = inp
        x = g - jnp.einsum("...ij,...j->...i", W, x_next)
        return x, x

    x_last = gs[-1]
    _, xs_rev = lax.scan(bwd, x_last, (Ws[:-1][::-1], gs[:-1][::-1]))
    xs = jnp.concatenate([xs_rev[::-1], x_last[None]], axis=0)
    return xs
