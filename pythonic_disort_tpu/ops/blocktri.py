"""Block-tridiagonal solver (block Thomas algorithm), TPU lanes layout.

The multi-layer boundary-value system of the discrete-ordinates method
couples per-layer coefficient vectors through layer-interface
continuity conditions; regrouping its rows in chunks of ``2N`` makes it
block tridiagonal with ``2N x 2N`` blocks.  The reference solves the
same system with a scalar banded LU (``scipy.linalg.solve_banded``,
reference ``_solve_for_coeffs.py:326``).

TPU-native design notes:

- Any ``(batch, 32, 32)`` tensor pads its trailing dim to the 128-lane
  tile (4x memory waste), and XLA's pivoted LU is latency-bound for
  small blocks (measured ~610 ms for a 64-step scan of batched 32x32
  solves on a v5e).  This solver therefore runs in a **batch-in-lanes**
  layout ``(B, B, batch)`` where every elimination step is an
  elementwise op across the huge batch: the same 64-step recursion
  measures ~34 ms.
- Block elimination is Gauss-Jordan with per-lane partial pivoting:
  each lane (batch element) picks its own pivot row via an argmax and
  masked row swap, so pivoting stays fully lane-parallel.  (Unpivoted
  elimination is not safe here: strongly peaked phase functions produce
  near-singular leading minors in the boundary blocks — Stamnes test
  4c exhibits a breakdown.)  The exponential scaling of the assembly
  (reference ``_solve_for_coeffs.py:264-273``) bounds entry growth, and
  the full Stamnes golden suite (incl. 48-layer, 40-stream atmospheres
  and tau=64 clouds) passes at float64 through this path.
- ``custom_vmap``: under ``jax.vmap`` (the columns x bands batch of a
  sweep), the batching rule folds the mapped axis into the lanes batch
  instead of leaving it as a leading axis, preserving the layout.

Convention: ``lower/diag/upper``: (L, *batch, B, B); ``rhs``:
(L, *batch, B).  Block row ``l`` reads ``lower[l] x[l-1] + diag[l] x[l]
+ upper[l] x[l+1] = rhs[l]``; ``lower[0]`` / ``upper[-1]`` ignored.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax


def _use_pallas(block, dtype):
    """Dispatch to the VMEM-resident Pallas block-Thomas kernel on TPU.

    Default on for f32 (opt out via ``PYDISORT_TPU_PALLAS=0``): the jnp
    lanes path scans L layers x 2N fori steps of elementwise HBM ops
    (~394 ms per 2048-solve bench chunk on a v5e); the Pallas kernel
    keeps each layer's Gauss-Jordan elimination in VMEM
    (`ops/pallas_blocktri.py`).  float64 stays on the jnp path (Mosaic
    has no 64-bit support).
    """
    return (
        os.environ.get("PYDISORT_TPU_PALLAS", "1") == "1"
        and jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
        and block <= 64
    )


def _lanes_matmul(A, B):
    """(n, k, b), (k, m, b) -> (n, m, b)."""
    return jnp.einsum("ikb,kmb->imb", A, B)


def _lanes_matvec(A, x):
    """(n, k, b), (k, b) -> (n, b)."""
    return jnp.einsum("ikb,kb->ib", A, x)


def gauss_jordan_solve_lanes(D, Aug, pivot=True):
    """Gauss-Jordan: solve ``D X = Aug`` in lanes layout.

    ``D``: (n, n, b); ``Aug``: (n, m, b).  Every step is elementwise
    across the lane batch ``b``.  With ``pivot`` (default), per-lane
    partial pivoting is done with an argmax + masked row swap — still
    fully lane-parallel (each lane picks its own pivot row).  The
    elimination loop is a ``fori_loop`` with dynamic slices: unrolling
    it costs ~400x in XLA compile time at no runtime benefit.
    """
    n = D.shape[0]
    a0 = jnp.concatenate([D, Aug], axis=1)         # (n, n+m, b)
    row_ids = jnp.arange(n)

    def body(k, a):
        if pivot:
            colk = lax.dynamic_slice_in_dim(a, k, 1, axis=1)[:, 0, :]
            col = jnp.where(row_ids[:, None] >= k, jnp.abs(colk), -jnp.inf)
            r = jnp.argmax(col, axis=0)                        # (b,)
            onehot_r = row_ids[:, None] == r[None, :]          # (n, b)
            pivot_row = jnp.take_along_axis(
                a, r[None, None, :].astype(row_ids.dtype), axis=0
            )[0]                                               # (n+m, b)
            rowk = lax.dynamic_slice_in_dim(a, k, 1, axis=0)   # (1, n+m, b)
            # row r receives old row k; row k receives the pivot row
            a = jnp.where(onehot_r[:, None, :], rowk, a)
            a = lax.dynamic_update_slice_in_dim(a, pivot_row[None], k, axis=0)
        rowk = lax.dynamic_slice_in_dim(a, k, 1, axis=0)       # (1, n+m, b)
        pv = lax.dynamic_slice_in_dim(rowk, k, 1, axis=1)[0, 0, :]
        piv = rowk[0] / pv[None, :]
        colk = lax.dynamic_slice_in_dim(a, k, 1, axis=1)[:, 0, :]
        a = a - colk[:, None, :] * piv[None, :, :]
        return lax.dynamic_update_slice_in_dim(a, piv[None], k, axis=0)

    a = lax.fori_loop(0, n, body, a0)
    return a[:, n:, :]


def assemble_bvp_blocks(Gt, decay_t, bt_rows):
    """Materialize the BVP block-tridiagonal operands in lanes layout.

    ``Gt``: (L, 2N, 2N, B) eigenvector blocks; ``decay_t``: (L, N, B)
    homogeneous decay factors; ``bt_rows``: (N, 2N, B) BDRF-corrected
    bottom boundary rows.  Returns ``(lower_t, diag_t, upper_t)``, each
    (L, 2N, 2N, B).  This is the XLA reference semantics of the fused
    in-kernel assembly (`pallas_blocktri.solve_bvp_fused`); the roles
    correspond to the reference's banded LHS assembly
    (reference ``_solve_for_coeffs.py:276-325``).
    """
    L, n2 = Gt.shape[:2]
    N = n2 // 2
    NFS = Gt.shape[-1]
    dtype = Gt.dtype
    Mtop_t = jnp.concatenate(
        [Gt[:, :, :N, :] * decay_t[:, None, :, :], Gt[:, :, N:, :]], axis=2
    )
    Mbot_t = jnp.concatenate(
        [Gt[:, :, :N, :], Gt[:, :, N:, :] * decay_t[:, None, :, :]], axis=2
    )
    if L == 1:
        Dg_t = jnp.concatenate([Mbot_t[0, N:, :, :], bt_rows], axis=0)[None]
        return jnp.zeros_like(Dg_t), Dg_t, jnp.zeros_like(Dg_t)
    d_top = jnp.concatenate(
        [Mbot_t[0:1, N:, :, :], -Mbot_t[1:, N:, :, :]], axis=0
    )
    d_bot = jnp.concatenate([Mtop_t[: L - 1, :N, :, :], bt_rows[None]], axis=0)
    Dg_t = jnp.concatenate([d_top, d_bot], axis=1)
    zN = jnp.zeros((1, N, n2, NFS), dtype)
    lower_t = jnp.concatenate(
        [jnp.concatenate([zN, Mtop_t[: L - 1, N:, :, :]], axis=0),
         jnp.zeros((L, N, n2, NFS), dtype)],
        axis=1,
    )
    upper_t = jnp.concatenate(
        [jnp.zeros((L, N, n2, NFS), dtype),
         jnp.concatenate([-Mbot_t[1:, :N, :, :], zN], axis=0)],
        axis=1,
    )
    return lower_t, Dg_t, upper_t


@jax.custom_vjp
def solve_block_tridiag(lower, diag, upper, rhs):
    """Solve a block-tridiagonal system; batched over middle axes.

    vmap folds mapped axes into the lane batch (custom_vmap rule on the
    core); reverse-mode AD solves the transposed system (custom_vjp).
    """
    return _solve_block_tridiag_core(lower, diag, upper, rhs)


def _blocktri_fwd(lower, diag, upper, rhs):
    x = _solve_block_tridiag_core(lower, diag, upper, rhs)
    return x, (lower, diag, upper, x)


def _blocktri_bwd(res, ct):
    lower, diag, upper, x = res
    T = lambda m: jnp.swapaxes(m, -1, -2)
    zero = jnp.zeros_like(diag[:1])
    # Transposed system: block row l of A^T couples y_{l-1} via
    # upper_{l-1}^T and y_{l+1} via lower_{l+1}^T.
    lower_T = jnp.concatenate([zero, T(upper)[:-1]], axis=0)
    upper_T = jnp.concatenate([T(lower)[1:], zero], axis=0)
    y = _solve_block_tridiag_core(lower_T, T(diag), upper_T, ct)
    outer = lambda a, b: a[..., :, None] * b[..., None, :]
    zero_x = jnp.zeros_like(x[:1])
    x_prev = jnp.concatenate([zero_x, x[:-1]], axis=0)
    x_next = jnp.concatenate([x[1:], zero_x], axis=0)
    d_lower = -outer(y, x_prev)
    d_diag = -outer(y, x)
    d_upper = -outer(y, x_next)
    return d_lower, d_diag, d_upper, y


solve_block_tridiag.defvjp(_blocktri_fwd, _blocktri_bwd)


def _blocktri_lanes_impl(lower_t, diag_t, upper_t, rhs_t):
    """Block-Thomas solve on RAW lanes operands.

    ``lower_t/diag_t/upper_t``: (L, n, n, B); ``rhs_t``: (L, n, B);
    returns ``x``: (L, n, B).  Forward-only; `solve_block_tridiag_lanes`
    adds the AD rule, `solve_block_tridiag` the padded interface.
    """
    L, n = diag_t.shape[:2]

    if L > 1 and _use_pallas(n, diag_t.dtype):
        from .pallas_blocktri import solve_block_tridiag_lanes_pallas

        return solve_block_tridiag_lanes_pallas(lower_t, diag_t, upper_t, rhs_t)

    if L == 1:
        x0 = gauss_jordan_solve_lanes(diag_t[0], rhs_t[0][:, None, :])[:, 0, :]
        return x0[None]

    aug0 = jnp.concatenate([upper_t[0], rhs_t[0][:, None, :]], axis=1)
    sol0 = gauss_jordan_solve_lanes(diag_t[0], aug0)
    W0, g0 = sol0[:, :-1, :], sol0[:, -1, :]

    def fwd(carry, inp):
        W_prev, g_prev = carry
        low, dia, upp, r = inp
        dhat = dia - _lanes_matmul(low, W_prev)
        rhat = r - _lanes_matvec(low, g_prev)
        aug = jnp.concatenate([upp, rhat[:, None, :]], axis=1)
        sol = gauss_jordan_solve_lanes(dhat, aug)
        W, g = sol[:, :-1, :], sol[:, -1, :]
        return (W, g), (W, g)

    (_, _), (Ws, gs) = lax.scan(
        fwd, (W0, g0), (lower_t[1:], diag_t[1:], upper_t[1:], rhs_t[1:])
    )
    Ws = jnp.concatenate([W0[None], Ws], axis=0)
    gs = jnp.concatenate([g0[None], gs], axis=0)

    def bwd(x_next, inp):
        W, g = inp
        x = g - _lanes_matvec(W, x_next)
        return x, x

    x_last = gs[-1]
    _, xs_rev = lax.scan(bwd, x_last, (Ws[:-1][::-1], gs[:-1][::-1]))
    return jnp.concatenate([xs_rev[::-1], x_last[None]], axis=0)  # (L, n, B)


@jax.custom_batching.custom_vmap
def _solve_block_tridiag_core(lower, diag, upper, rhs):
    L = diag.shape[0]
    B = diag.shape[-1]
    batch_shape = diag.shape[1:-2]

    # Flatten batch axes and move them into lanes: (L, B, B, nb)
    def tmat(x):
        return jnp.moveaxis(x.reshape((L, -1, B, B)), 1, 3)

    def tvec(x):
        return jnp.moveaxis(x.reshape((L, -1, B)), 1, 2)

    xs = _blocktri_lanes_impl(tmat(lower), tmat(diag), tmat(upper), tvec(rhs))
    return jnp.moveaxis(xs, 2, 1).reshape((L,) + batch_shape + (B,))


@jax.custom_vjp
def solve_block_tridiag_lanes(lower_t, diag_t, upper_t, rhs_t):
    """Block-tridiagonal solve on RAW lanes operands (see
    `_blocktri_lanes_impl` for shapes), with reverse-mode AD via the
    transposed system — the lanes-layout sibling of
    `solve_block_tridiag` used by the production batched solve."""
    return _blocktri_lanes_impl(lower_t, diag_t, upper_t, rhs_t)


def _blocktri_lanes_fwd(lower_t, diag_t, upper_t, rhs_t):
    x = _blocktri_lanes_impl(lower_t, diag_t, upper_t, rhs_t)
    return x, (lower_t, diag_t, upper_t, x)


def _blocktri_lanes_bwd(res, ct):
    lower_t, diag_t, upper_t, x = res
    T = lambda m: jnp.swapaxes(m, 1, 2)
    zero = jnp.zeros_like(diag_t[:1])
    lower_T = jnp.concatenate([zero, T(upper_t)[:-1]], axis=0)
    upper_T = jnp.concatenate([T(lower_t)[1:], zero], axis=0)
    y = _blocktri_lanes_impl(lower_T, T(diag_t), upper_T, ct)
    outer = lambda a, b: a[:, :, None, :] * b[:, None, :, :]
    zero_x = jnp.zeros_like(x[:1])
    x_prev = jnp.concatenate([zero_x, x[:-1]], axis=0)
    x_next = jnp.concatenate([x[1:], zero_x], axis=0)
    return -outer(y, x_prev), -outer(y, x), -outer(y, x_next), y


solve_block_tridiag_lanes.defvjp(_blocktri_lanes_fwd, _blocktri_lanes_bwd)


@_solve_block_tridiag_core.def_vmap
def _solve_block_tridiag_vmap(axis_size, in_batched, lower, diag, upper, rhs):
    """Fold a vmapped axis into the lanes batch (axis 1), not a leading
    axis — preserves the batch-in-lanes layout under (nested) vmap."""
    def fold(x, batched):
        if batched:
            return jnp.moveaxis(x, 0, 1)       # (L, bnew, *batch, ...)
        return jnp.broadcast_to(x[:, None], (x.shape[0], axis_size) + x.shape[1:])

    args = [
        fold(x, b)
        for x, b in zip((lower, diag, upper, rhs), in_batched)
    ]
    out = _solve_block_tridiag_core(*args)     # (L, bnew, *batch, B)
    return jnp.moveaxis(out, 1, 0), True
