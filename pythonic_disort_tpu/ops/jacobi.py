"""Batched symmetric eigendecomposition via parallel-ordering Jacobi.

XLA's generic ``eigh`` is built for large single matrices; on the
discrete-ordinates workload — enormous batches of tiny (N/2 x N/2)
SPD matrices — it dominates the whole solve (measured ~1.7 s for
65536 x 16 x 16 f32 on a v5e chip vs ~27 ms for a batched matmul of
the same footprint).

The root cause is layout: any (..., 16, 16) tensor pads its trailing
dimension to the 128-lane TPU tile, wasting 8x memory traffic on every
operation.  This solver therefore runs in a **batch-in-lanes** layout:
the matrix plane is transposed to (N, N, B) so the huge batch axis
occupies the lanes and every Givens rotation is an elementwise op on
(N/2, N, B) slices with *static* row indices:

- a round applies N/2 disjoint rotations (round-robin tournament
  schedule, static per round) to rows then columns;
- a sweep is N-1 rounds covering all N(N-1)/2 pairs; rounds and sweeps
  are unrolled in Python (all indexing static — no gathers);
- fixed sweep count by dtype (quadratic convergence; ~9 sweeps reach
  f64 machine precision for N <= 32).

Jacobi is also the *most accurate* dense symmetric eigensolver (tiny
relative error even in small eigenvalues), which matters for the
near-conservative-scattering limit where the smallest K^2 -> 0.
"""

from __future__ import annotations

import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def _round_robin_schedule(n):
    """(n-1) rounds of n/2 disjoint pairs covering all pairs once."""
    assert n % 2 == 0
    players = list(range(n))
    rounds = []
    for _ in range(n - 1):
        pairs = [(players[i], players[n - 1 - i]) for i in range(n // 2)]
        rounds.append([(min(a, b), max(a, b)) for a, b in pairs])
        players = [players[0]] + [players[-1]] + players[1:-1]
    arr = np.array(rounds)
    return arr[..., 0], arr[..., 1]


def default_sweeps(n, dtype):
    env = os.environ.get("PYDISORT_TPU_JACOBI_SWEEPS")
    if env:
        return int(env)      # experimentation knob (trace-time; A/B only)
    if jnp.dtype(dtype) == jnp.float64:
        return 9 if n <= 32 else 12
    # f32: 5 sweeps passes the FULL TPU certification (35 Stamnes golden
    # cases + production/intensity bounds) with bench-config f32-vs-f64
    # error identical to 6 sweeps (5.38e-4 rel-to-scale both); 4 sweeps
    # fails golden 5a (tau=64 conservative cloud, the K-sensitive
    # extreme) — so 5 is the validated floor with one sweep of margin.
    return 5 if n <= 32 else 8


def _use_pallas(n, dtype):
    """Dispatch to the VMEM-resident Pallas kernel on TPU for f32.

    Default on (opt out via ``PYDISORT_TPU_PALLAS=0``): measured 86 ms
    vs 523 ms for the jnp lanes path on 131072 16x16 f32 (v5e), and the
    row-wise kernel formulation compiles in seconds.  float64 stays on
    the jnp path (Mosaic has no 64-bit support).
    """
    import os

    return (
        os.environ.get("PYDISORT_TPU_PALLAS", "1") == "1"
        and jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
        and n % 2 == 0
        and n <= 32
    )


def _inv_perm(p, q, n):
    perm = np.concatenate([p, q])
    inv = np.empty(n, dtype=np.int64)
    inv[perm] = np.arange(n)
    return inv


def jacobi_eigh(A, sweeps=None, sort=True):
    """Eigendecomposition of symmetric ``A`` (..., N, N), batched.

    Returns ``(w, V)`` with eigenvalues ascending and ``A = V w V^T``.
    Drop-in replacement for ``jnp.linalg.eigh`` on large batches of
    small matrices.  Under ``jax.vmap`` the mapped axis folds into the
    internal lane batch (see ``_jacobi_eigh_vmap``).

    ``sort=False`` skips the final ascending sort + eigenvector gather
    (a padded-layout take_along_axis over the whole batch).  Column
    order of an eigendecomposition is irrelevant to any consumer that
    treats the columns as a basis — the discrete-ordinates solve does —
    so its hot path opts out (`ops/eig.py`).
    """
    if sweeps is None:
        return _jacobi_eigh_ad(A) if sort else _jacobi_eigh_ad_unsorted(A)
    return _jacobi_core(A, sweeps, sort)


@jax.custom_batching.custom_vmap
def _jacobi_eigh_default(A):
    return _jacobi_core(A, None, True)


@_jacobi_eigh_default.def_vmap
def _jacobi_eigh_vmap(axis_size, in_batched, A):
    # The core flattens every leading axis into the lane batch, so the
    # batching rule is simply to call it on the stacked operand.
    del axis_size, in_batched
    return _jacobi_eigh_default(A), (True, True)


@jax.custom_batching.custom_vmap
def _jacobi_eigh_default_unsorted(A):
    return _jacobi_core(A, None, False)


@_jacobi_eigh_default_unsorted.def_vmap
def _jacobi_eigh_vmap_unsorted(axis_size, in_batched, A):
    del axis_size, in_batched
    return _jacobi_eigh_default_unsorted(A), (True, True)


def _eigh_jvp_rule(fn, primals, tangents):
    (A,), (dA,) = primals, tangents
    w, V = fn(A)
    # Standard symmetric-eig differential: with S = V^T dA V,
    # dw = diag(S); dV = V (F o S), F_ij = 1/(w_j - w_i), F_ii = 0.
    S = jnp.einsum("...ji,...jk,...kl->...il", V, dA, V)
    dw = jnp.diagonal(S, axis1=-2, axis2=-1)
    gap = w[..., None, :] - w[..., :, None]
    F = jnp.where(jnp.abs(gap) > 0, 1.0 / jnp.where(gap == 0, 1.0, gap), 0.0)
    dV = jnp.einsum("...ij,...jk->...ik", V, F * S)
    return (w, V), (dw, dV)


@jax.custom_jvp
def _jacobi_eigh_ad(A):
    """AD-enabled wrapper: custom_vmap functions don't support autodiff,
    so differentiation goes through the analytic eigh tangent rule."""
    return _jacobi_eigh_default(A)


@_jacobi_eigh_ad.defjvp
def _jacobi_eigh_jvp(primals, tangents):
    return _eigh_jvp_rule(_jacobi_eigh_ad, primals, tangents)


@jax.custom_jvp
def _jacobi_eigh_ad_unsorted(A):
    return _jacobi_eigh_default_unsorted(A)


@_jacobi_eigh_ad_unsorted.defjvp
def _jacobi_eigh_jvp_unsorted(primals, tangents):
    return _eigh_jvp_rule(_jacobi_eigh_ad_unsorted, primals, tangents)


def jacobi_eigh_lanes_raw(At, sweeps=None):
    """Unsorted eigendecomposition on a RAW lanes operand ``At`` (n, n, B).

    Returns ``(w_l (n, B), V_l (n, n, B))`` in lanes layout.  Dispatches
    to the Pallas VMEM kernel on TPU f32; forward-only building block
    for callers already holding lanes-layout data.
    """
    n = At.shape[0]
    dtype = At.dtype
    if sweeps is None:
        sweeps = default_sweeps(n, dtype)
    if _use_pallas(n, dtype):
        from .pallas_jacobi import jacobi_eigh_lanes_pallas

        w_l, V_l = jacobi_eigh_lanes_pallas(At, sweeps)
        return w_l, V_l
    return _jacobi_lanes_jnp(At, sweeps)


def _jacobi_core(A, sweeps, sort=True):
    A = jnp.asarray(A)
    n = A.shape[-1]
    dtype = A.dtype
    if sweeps is None:
        sweeps = default_sweeps(n, dtype)
    batch_shape = A.shape[:-2]

    # Batch-in-lanes layout: (N, N, B)
    At = jnp.moveaxis(A.reshape((-1, n, n)), 0, -1)

    w_l, V_l = jacobi_eigh_lanes_raw(At, sweeps)
    w = jnp.moveaxis(w_l, -1, 0)                   # (B, n)
    V = jnp.moveaxis(V_l, -1, 0)                   # (B, n, n)
    if sort:
        order = jnp.argsort(w, axis=-1)
        w = jnp.take_along_axis(w, order, axis=-1)
        V = jnp.take_along_axis(V, order[:, None, :], axis=-1)
    return (
        w.reshape(batch_shape + (n,)),
        V.reshape(batch_shape + (n, n)),
    )


def _jacobi_lanes_jnp(At, sweeps):
    """jnp lanes Jacobi (the f64/CPU path); input/output lanes (n, n, B)."""
    n = At.shape[0]
    dtype = At.dtype

    p_sched, q_sched = _round_robin_schedule(n)
    rounds = [
        (tuple(p_sched[r]), tuple(q_sched[r]),
         tuple(_inv_perm(p_sched[r], q_sched[r], n)))
        for r in range(n - 1)
    ]

    Vt = jnp.zeros_like(At).at[jnp.arange(n), jnp.arange(n), :].set(1.0)

    def one_sweep(carry, _):
        At, Vt = carry
        for p, q, inv in rounds:
            pj = list(p)
            qj = list(q)
            # Rotation parameters from the pivots (all static indexing)
            app = At[pj, pj, :]                    # (n/2, B)
            aqq = At[qj, qj, :]
            apq = At[pj, qj, :]
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
            crow = c[:, None, :]                   # rows: (n/2, 1, B)
            srow = s[:, None, :]
            ccol = c[None, :, :]                   # cols: (1, n/2, B)
            scol = s[None, :, :]

            # Row rotation: A <- R^T A
            Ap = At[pj, :, :]                      # (n/2, n, B)
            Aq = At[qj, :, :]
            new_p = crow * Ap - srow * Aq
            new_q = srow * Ap + crow * Aq
            At = jnp.concatenate([new_p, new_q], axis=0)[list(inv), :, :]

            # Column rotation: A <- A R
            Ap = At[:, pj, :]                      # (n, n/2, B)
            Aq = At[:, qj, :]
            new_p = ccol * Ap - scol * Aq
            new_q = scol * Ap + ccol * Aq
            At = jnp.concatenate([new_p, new_q], axis=1)[:, list(inv), :]

            # Accumulate eigenvectors: V <- V R (column update)
            Vp = Vt[:, pj, :]
            Vq = Vt[:, qj, :]
            nvp = ccol * Vp - scol * Vq
            nvq = scol * Vp + ccol * Vq
            Vt = jnp.concatenate([nvp, nvq], axis=1)[:, list(inv), :]
        return (At, Vt), None

    (At, Vt), _ = lax.scan(one_sweep, (At, Vt), None, length=sweeps)

    w = At[jnp.arange(n), jnp.arange(n), :]        # (n, B)
    return w, Vt
