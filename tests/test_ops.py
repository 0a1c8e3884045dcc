"""Unit tests for the low-level ops (quadrature, Legendre, eig,
block-tridiagonal solver, Planck band integration)."""

from math import pi

import numpy as np
import scipy.special
import scipy.integrate
import jax
import jax.numpy as jnp

from pythonic_disort_tpu.ops.quadrature import (
    clenshaw_curtis, double_gauss, gauss_legendre,
)
from pythonic_disort_tpu.ops.legendre import (
    legendre_series, normalized_assoc_legendre,
)
from pythonic_disort_tpu.ops.eig import disort_eigh
from pythonic_disort_tpu.ops.blocktri import solve_block_tridiag
from pythonic_disort_tpu.ops import planck as jplanck
from pythonic_disort_tpu.utils.thermal import blackbody_contrib_to_BCs, planck


def test_gauss_legendre_integrates_polynomials():
    x, w = gauss_legendre(8, 0, 1)
    for p in range(2 * 8):
        np.testing.assert_allclose(w @ x**p, 1 / (p + 1), rtol=1e-12)


def test_clenshaw_curtis_integrates_polynomials():
    x, w = clenshaw_curtis(17)
    np.testing.assert_allclose(w.sum(), 2 * pi, rtol=1e-12)
    # Exact for polynomials up to the panel count (16)
    for p in range(1, 16):
        np.testing.assert_allclose(
            w @ x**p, (2 * pi) ** (p + 1) / (p + 1), rtol=1e-12
        )
    # Spectral accuracy for smooth periodic integrands
    x65, w65 = clenshaw_curtis(65)
    np.testing.assert_allclose(w65 @ np.sin(3 * x65) ** 2, pi, rtol=1e-12)


def test_normalized_assoc_legendre_vs_scipy():
    x = np.linspace(-0.99, 0.99, 7)
    nmodes, ndeg = 6, 10
    lam = np.asarray(normalized_assoc_legendre(nmodes, ndeg, jnp.asarray(x)))
    for m in range(nmodes):
        for l in range(ndeg):
            if l < m:
                np.testing.assert_allclose(lam[m, l], 0, atol=1e-14)
                continue
            norm = np.sqrt(
                scipy.special.poch(l + m + 1, -2 * m)
            )
            ref = np.abs(scipy.special.lpmv(m, l, x)) * np.sign(
                scipy.special.lpmv(m, l, x)
            ) * norm * (-1) ** m  # undo Condon-Shortley
            np.testing.assert_allclose(lam[m, l], ref, rtol=1e-10, atol=1e-12)


def test_legendre_series_vs_numpy():
    rng = np.random.default_rng(0)
    coeffs = rng.normal(size=(3, 9))
    x = rng.uniform(-1, 1, size=(4, 5))
    ours = np.asarray(legendre_series(jnp.asarray(coeffs), jnp.asarray(x)))
    for b in range(3):
        ref = np.polynomial.legendre.Legendre(coeffs[b])(x)
        np.testing.assert_allclose(ours[b], ref, rtol=1e-10, atol=1e-12)


def test_disort_eigh_reproduces_nonsymmetric_eig():
    rng = np.random.default_rng(1)
    N, NLeg = 8, 16
    mu, w = double_gauss(2 * N)
    omega, g0 = 0.95, 0.8
    g = g0 ** np.arange(NLeg)
    lam = np.asarray(normalized_assoc_legendre(1, NLeg, jnp.asarray(mu)))[0]
    c = (omega / 2) * (2 * np.arange(NLeg) + 1) * g
    sgn = (-1.0) ** np.arange(NLeg)
    Dp = np.einsum("c,ci,cj->ij", c, lam, lam)
    Dm = np.einsum("c,ci,cj->ij", c * sgn, lam, lam)
    alpha = (1 / mu)[:, None] * (Dp * w[None, :] - np.eye(N))
    beta = (1 / mu)[:, None] * Dm * w[None, :]
    S = (alpha - beta) @ (alpha + beta)
    K, X, Y, P, Q = [
        np.asarray(a)
        for a in disort_eigh(jnp.asarray(Dp), jnp.asarray(Dm), jnp.asarray(mu), jnp.asarray(w))
    ]
    np.testing.assert_allclose(
        np.sort(K**2), np.sort(np.linalg.eigvals(S).real), rtol=1e-9
    )
    resid = np.abs(S @ X - X * (K**2)[None, :]).max() / np.abs(S @ X).max()
    assert resid < 1e-11
    np.testing.assert_allclose(P @ X, np.eye(N), atol=1e-9)
    np.testing.assert_allclose(Q @ Y, np.eye(N), atol=1e-9)


def test_block_tridiag_vs_dense():
    rng = np.random.default_rng(2)
    L, B, nb = 6, 3, 4
    lower = rng.normal(size=(L, nb, B, B))
    diag = rng.normal(size=(L, nb, B, B)) + 5 * np.eye(B)
    upper = rng.normal(size=(L, nb, B, B))
    rhs = rng.normal(size=(L, nb, B))
    x = np.asarray(
        solve_block_tridiag(*map(jnp.asarray, (lower, diag, upper, rhs)))
    )
    for m in range(nb):
        A = np.zeros((L * B, L * B))
        for l in range(L):
            A[l * B:(l + 1) * B, l * B:(l + 1) * B] = diag[l, m]
            if l > 0:
                A[l * B:(l + 1) * B, (l - 1) * B:l * B] = lower[l, m]
            if l < L - 1:
                A[l * B:(l + 1) * B, (l + 1) * B:(l + 2) * B] = upper[l, m]
        ref = np.linalg.solve(A, rhs[:, m].ravel())
        np.testing.assert_allclose(x[:, m].ravel(), ref, rtol=1e-8, atol=1e-10)


def test_planck_band_integration_vs_adaptive():
    T = np.array([100.0, 200.0, 300.0, 320.0])
    for lo, hi in [(0.0, 50000.0), (300.0, 800.0), (2702.99, 2703.01), (999.0, 1000.0)]:
        ours = np.asarray(
            jplanck.band_integrated_emission(jnp.asarray(T), lo, hi)
        )
        lo_eff = max(lo, 1e-9)
        ref = blackbody_contrib_to_BCs(T, lo_eff, hi)
        np.testing.assert_allclose(ours, ref, rtol=1e-6)


def test_planck_pointwise_matches_host():
    T = np.array([0.0, 150.0, 300.0])
    wv = 50000.0
    np.testing.assert_allclose(
        np.asarray(jplanck.planck(jnp.asarray(T), wv)), planck(T, wv),
        rtol=1e-12,
    )
