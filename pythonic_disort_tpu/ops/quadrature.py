"""Quadrature-rule generation.

These are host-side, trace-time constants for the solver (the nodes and
weights never depend on traced values), so they are computed with NumPy
once and baked into the compiled program as literals.

Capability parity: reference ``subroutines.py:33-175`` (interval/weight
affine transforms, double-Gauss ``Gauss_Legendre_quad``, Clenshaw-Curtis
``Clenshaw_Curtis_quad``).  Implementations are independent: the
Clenshaw-Curtis weights here come from the closed-form cosine sum rather
than an inverse DCT.
"""

from __future__ import annotations

import numpy as np


def transform_interval(arr, c, d, a=-1.0, b=1.0):
    """Affinely map points from the interval [a, b] onto [c, d]."""
    arr = np.asarray(arr)
    return c + (arr - a) * ((d - c) / (b - a))


def transform_weights(weights, c, d, a=-1.0, b=1.0):
    """Rescale quadrature weights from the interval [a, b] onto [c, d]."""
    weights = np.asarray(weights)
    return weights * ((d - c) / (b - a))


def gauss_legendre(n: int, c: float = 0.0, d: float = 1.0):
    """Gauss-Legendre nodes/weights on [c, d] (default [0, 1]).

    With the default interval this is one hemisphere of the "double
    Gauss" rule used by the discrete-ordinates solver: the same nodes
    mirrored to [-1, 0] quadrate the other hemisphere with identical
    weights.  Nodes are returned in ascending order.
    """
    x, w = np.polynomial.legendre.leggauss(int(n))
    return transform_interval(x, c, d), transform_weights(w, c, d)


def double_gauss(nquad: int):
    """The double-Gauss rule for ``nquad`` total streams.

    Returns ``(mu_pos, w)`` with ``nquad // 2`` positive nodes on (0, 1)
    in ascending order; the full node set is ``[mu_pos, -mu_pos]``.
    """
    return gauss_legendre(nquad // 2, 0.0, 1.0)


def clenshaw_curtis(nphi: int, c: float = 0.0, d: float = 2.0 * np.pi):
    """Clenshaw-Curtis nodes/weights on [c, d] (default [0, 2*pi]).

    ``nphi`` must be odd and > 2 (an even panel count), matching the
    reference's constraint.  Weights come from the closed-form cosine
    expansion of the integrals of the Chebyshev interpolant:

        w_j = (2/n) * sum_{k=0}^{n/2} '' cos(2*k*theta_j) / (1 - 4 k^2)

    where theta_j = pi*j/n and the double-primed sum halves its first
    and last terms (j interior); endpoint weights are halved once more.
    """
    if not (nphi > 2 and nphi % 2 == 1):
        raise ValueError("The number of quadrature nodes must be odd and greater than 2.")
    n = nphi - 1  # number of panels, even
    j = np.arange(n + 1)
    theta = np.pi * j / n
    nodes = -np.cos(theta)  # ascending on [-1, 1]

    k = np.arange(n // 2 + 1)
    coeff = 2.0 / (1.0 - 4.0 * k**2)  # integral of cos(2k theta) factor
    terms = coeff[None, :] * np.cos(2.0 * np.outer(theta, k))
    terms[:, 0] *= 0.5
    terms[:, -1] *= 0.5
    w = (2.0 / n) * terms.sum(axis=1)
    w[0] *= 0.5
    w[-1] *= 0.5

    return transform_interval(nodes, c, d), transform_weights(w, c, d)
