"""Legendre-function kernels.

Two building blocks of the discrete-ordinates phase-function machinery:

1. ``normalized_assoc_legendre`` - the table
   ``lam[m, l, i] = sqrt((l-m)!/(l+m)!) * P_l^m(x_i)`` for all Fourier
   modes ``m < nmodes`` and degrees ``l < ndeg`` at once.  The scattering
   kernels only ever use *products* ``lam(x_i) lam(x_j)``, where this
   normalization makes the basis orthonormal-ish and overflow-free, and
   where the Condon-Shortley phase cancels (so it is omitted).  This
   replaces the reference's per-mode ``scipy.special.lpmv``/``poch``
   calls (reference ``_solve_for_gen_and_part_sols.py:97-106``) with one
   static-shaped recurrence evaluated on device.

2. ``legendre_series`` - Clenshaw evaluation of
   ``sum_l c_l P_l(x)`` for batched coefficient sets, replacing
   ``numpy.polynomial.legendre.Legendre.__call__`` (reference
   ``pydisort.py:432-449``).

Both use only static shapes and ``lax``-friendly loops.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def _seed_log_coeffs(nmodes: int) -> np.ndarray:
    """log of |lam_m^m| prefactors: sqrt(prod_{k=1..m} (2k-1)/(2k))."""
    m = np.arange(nmodes)
    with np.errstate(divide="ignore"):
        ratios = np.concatenate([[0.0], np.log(2.0 * m[1:] - 1.0) - np.log(2.0 * m[1:])])
    return 0.5 * np.cumsum(ratios)


def normalized_assoc_legendre(nmodes: int, ndeg: int, x: jnp.ndarray) -> jnp.ndarray:
    """Table ``lam[m, l, i]`` of normalized associated Legendre functions.

    ``lam_l^m(x) = sqrt((l-m)!/(l+m)!) P_l^m(x)`` without the
    Condon-Shortley phase; entries with ``l < m`` are exactly zero.

    Uses the degree-upward three-term recurrence

        sqrt((l+1)^2 - m^2) lam_{l+1} = (2l+1) x lam_l - sqrt(l^2 - m^2) lam_{l-1}

    seeded at ``lam_m^m(x) = sqrt(prod_{k<=m} (2k-1)/(2k)) (1-x^2)^{m/2}``,
    which is stable for this normalization.

    Parameters
    ----------
    nmodes : number of Fourier modes m (static).
    ndeg : number of degrees l (static); requires ``ndeg >= nmodes``.
    x : (npts,) evaluation points in [-1, 1].

    Returns
    -------
    (nmodes, ndeg, npts) array.
    """
    x = jnp.asarray(x)
    dtype = x.dtype
    npts = x.shape[0]
    ms = jnp.arange(nmodes, dtype=dtype)[:, None]  # (m, 1)

    # Seeds lam_m^m(x) for every mode: (nmodes, npts)
    log_c = jnp.asarray(_seed_log_coeffs(nmodes), dtype=dtype)[:, None]
    one_minus_x2 = jnp.maximum(1.0 - x[None, :] ** 2, 0.0)
    # (1-x^2)^{m/2} in log space; guard log(0) for |x| = 1 (lam = 0 there for m>0)
    safe = jnp.where(one_minus_x2 > 0.0, one_minus_x2, 1.0)
    seeds = jnp.exp(log_c + 0.5 * ms * jnp.log(safe))
    seeds = jnp.where((one_minus_x2 > 0.0) | (ms == 0), seeds, 0.0)

    def step(carry, ell):
        prev, prev2 = carry  # lam_{l-1}, lam_{l-2}: (nmodes, npts)
        ellf = ell.astype(dtype)
        denom = jnp.sqrt(jnp.maximum(ellf**2 - ms**2, 0.0))
        safe_denom = jnp.where(denom > 0.0, denom, 1.0)
        rec = ((2.0 * ellf - 1.0) * x[None, :] * prev
               - jnp.sqrt(jnp.maximum((ellf - 1.0) ** 2 - ms**2, 0.0)) * prev2) / safe_denom
        cur = jnp.where(ms == ellf, seeds, jnp.where(ms < ellf, rec, 0.0))
        return (cur, prev), cur

    init = (jnp.zeros((nmodes, npts), dtype), jnp.zeros((nmodes, npts), dtype))
    _, table = lax.scan(step, init, jnp.arange(ndeg))
    return jnp.moveaxis(table, 0, 1)  # (nmodes, ndeg, npts)


def normalized_assoc_legendre_host(nmodes: int, ndeg: int, x) -> np.ndarray:
    """NumPy twin of `normalized_assoc_legendre` (same recurrence, f64).

    For evaluation points known at TRACE time — the quadrature-node
    table is problem-independent, so computing it host-side embeds it
    as a program constant and removes the on-device `lax.scan` from
    every production chunk (measured ~2.3 ms per 512-column chunk on a
    v5e, ~8% of the solve).
    """
    x = np.asarray(x, np.float64)
    npts = x.shape[0]
    ms = np.arange(nmodes, dtype=np.float64)[:, None]
    log_c = _seed_log_coeffs(nmodes)[:, None]
    one_minus_x2 = np.maximum(1.0 - x[None, :] ** 2, 0.0)
    safe = np.where(one_minus_x2 > 0.0, one_minus_x2, 1.0)
    seeds = np.exp(log_c + 0.5 * ms * np.log(safe))
    seeds = np.where((one_minus_x2 > 0.0) | (ms == 0), seeds, 0.0)

    out = np.zeros((nmodes, ndeg, npts))
    prev = np.zeros((nmodes, npts))
    prev2 = np.zeros((nmodes, npts))
    for ell in range(ndeg):
        denom = np.sqrt(np.maximum(float(ell) ** 2 - ms**2, 0.0))
        safe_denom = np.where(denom > 0.0, denom, 1.0)
        rec = (
            (2.0 * ell - 1.0) * x[None, :] * prev
            - np.sqrt(np.maximum((ell - 1.0) ** 2 - ms**2, 0.0)) * prev2
        ) / safe_denom
        cur = np.where(ms == ell, seeds, np.where(ms < ell, rec, 0.0))
        out[:, ell] = cur
        prev2, prev = prev, cur
    return out


def legendre_series(coeffs: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Evaluate Legendre series ``f_b(x) = sum_l coeffs[b, l] P_l(x)``.

    Clenshaw's algorithm, descending in degree, as a ``lax.scan``.

    Parameters
    ----------
    coeffs : (..., ndeg) batched coefficients.
    x : arbitrary-shape evaluation points.

    Returns
    -------
    array of shape ``coeffs.shape[:-1] + x.shape``.
    """
    coeffs = jnp.asarray(coeffs)
    x = jnp.asarray(x)
    batch_shape = coeffs.shape[:-1]
    ndeg = coeffs.shape[-1]
    xf = x.reshape(-1)  # (npts,)
    c = coeffs.reshape(-1, ndeg)  # (nb, ndeg)

    def step(carry, ell):
        b1, b2 = carry  # (nb, npts)
        ellf = ell.astype(xf.dtype)
        alpha = (2.0 * ellf + 1.0) / (ellf + 1.0)
        beta = (ellf + 1.0) / (ellf + 2.0)
        b0 = c[:, ell][:, None] + alpha * xf[None, :] * b1 - beta * b2
        return (b0, b1), None

    nb = c.shape[0]
    init = (jnp.zeros((nb, xf.shape[0]), xf.dtype), jnp.zeros((nb, xf.shape[0]), xf.dtype))
    (b0, _), _ = lax.scan(step, init, jnp.arange(ndeg - 1, -1, -1))
    # With b_l = c_l + A_l(x) b_{l+1} + B_{l+1} b_{l+2} (A_l = (2l+1)x/(l+1),
    # B_{l+1} = -(l+1)/(l+2)) and P_1 = A_0(x) P_0, Clenshaw gives f = b_0.
    return b0.reshape(batch_shape + x.shape)
