"""Jittable Planck band integration for on-device spectral sweeps.

The host-side helpers (``utils/thermal.py``) use adaptive quadrature;
this is the device path: fixed-order Gauss-Legendre panels over
wavenumber, jit/vmap-compatible, for computing per-band blackbody
sources of many (column, band) problems inside one compiled program.
Replaces the role of ``scipy.integrate.quad_vec`` in reference
``subroutines.py:354-377,448``.

The Planck integrand in wavenumber is smooth but sharply peaked near
``wv_peak ~ 1.93 T`` (wavenumber in cm^-1 when ``T`` in kelvin); for
wide bands a uniform panel split under-resolves the peak, so panels are
placed on a geometric grid anchored at the peak.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import scipy.constants as const

_C2 = 100.0 * const.h * const.c / const.k        # second radiation constant x100
_PREF = 2e8 * const.h * const.c**2


def planck(T, wvnm):
    """Blackbody emission W/m^2 at temperature T [K], wavenumber [m^-1].

    Overflow-safe; jnp-traced.  Matches ``utils.thermal.planck``.
    """
    T = jnp.asarray(T)
    x = _C2 * wvnm / jnp.where(T > 0, T, 1.0)
    e = jnp.exp(-x)
    return jnp.where(T > 0, _PREF * wvnm**3 * e / (1.0 - e), 0.0)


def band_integrated_emission(T, wvnmlo, wvnmhi, order=32, panels=8):
    """Integral of ``planck(T, .)`` over [wvnmlo, wvnmhi]; jittable.

    T may be any shape (broadcast against the quadrature grid); band
    edges are static Python floats (panel layout is trace-time).
    """
    x, w = np.polynomial.legendre.leggauss(order)
    lo, hi = float(wvnmlo), float(wvnmhi)
    if hi <= lo:
        return jnp.zeros(jnp.shape(T))
    # Geometric panel edges spanning the band, denser toward the low end
    # (covers the emission peak for all realistic temperatures).
    edges = np.unique(
        np.concatenate(
            [[lo], np.geomspace(max(lo, hi * 1e-4), hi, panels), [hi]]
        )
    )
    edges = edges[(edges >= lo) & (edges <= hi)]
    if edges[0] > lo:
        edges = np.concatenate([[lo], edges])
    if edges[-1] < hi:
        edges = np.concatenate([edges, [hi]])
    nodes, weights = [], []
    for a, b in zip(edges[:-1], edges[1:]):
        nodes.append(0.5 * (b - a) * x + 0.5 * (a + b))
        weights.append(0.5 * (b - a) * w)
    nodes = jnp.asarray(np.concatenate(nodes))
    weights = jnp.asarray(np.concatenate(weights))
    T = jnp.asarray(T)
    vals = planck(T[..., None], nodes)
    return jnp.sum(vals * weights, axis=-1)


def s_poly_coeffs_from_temper(tau_arr, temper, wvnmlo, wvnmhi, **quad_kw):
    """Jittable DISORT-style linear source polynomials from a
    temperature profile (device analogue of
    ``utils.thermal.generate_s_poly_coeffs``).

    ``tau_arr``: (..., L), ``temper``: (..., L+1).  Returns (..., L, 2)
    ascending-order coefficients.
    """
    emission = band_integrated_emission(temper, wvnmlo, wvnmhi, **quad_kw)
    grid = jnp.concatenate(
        [jnp.zeros(tau_arr.shape[:-1] + (1,), tau_arr.dtype), tau_arr], axis=-1
    )
    slope = jnp.diff(emission, axis=-1) / jnp.diff(grid, axis=-1)
    intercept = emission[..., :-1] - slope * grid[..., :-1]
    return jnp.stack([intercept, slope], axis=-1)
