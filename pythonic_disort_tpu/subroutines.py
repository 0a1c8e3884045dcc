"""Reference-compatible ``subroutines`` namespace.

Users of the reference import helpers as
``PythonicDISORT.subroutines.<name>``; this module re-exports the
equivalent components of this framework under the same names
(capability parity with reference ``subroutines.py``).
"""

from .ops.quadrature import (
    gauss_legendre,
    clenshaw_curtis,
)
from .utils.misc import (
    prepend,
    calculate_nu,
    atleast_2d_append,
    generate_FD_mat,
    to_diag_ordered_form,
    transform_interval,
    transform_weights,
)
from .utils.thermal import (
    Planck,
    planck,
    blackbody_contrib_to_BCs,
    linear_spline_coefficients,
    generate_s_poly_coeffs,
)
from .utils.bdrf import (
    generate_emissivity_from_BDRF,
    cache_BDRF_Fourier_modes,
    fourier_modes_from_bdrf,
)
from .utils.actinic import generate_diff_act_flux_funcs
from .utils.interpolate import interpolate
from .utils.compare import _compare, compare


def Gauss_Legendre_quad(N, c=0, d=1):
    """Gauss-Legendre nodes/weights on [c, d] (reference name)."""
    return gauss_legendre(N, c, d)


def Clenshaw_Curtis_quad(Nphi, c=0.0, d=None):
    """Clenshaw-Curtis nodes/weights on [c, d] (reference name)."""
    import math

    if d is None:
        d = 2 * math.pi
    return clenshaw_curtis(Nphi, c, d)


__all__ = [
    "Gauss_Legendre_quad", "Clenshaw_Curtis_quad", "gauss_legendre",
    "clenshaw_curtis", "prepend", "calculate_nu", "atleast_2d_append",
    "generate_FD_mat", "to_diag_ordered_form", "transform_interval",
    "transform_weights", "Planck", "planck", "blackbody_contrib_to_BCs",
    "linear_spline_coefficients", "generate_s_poly_coeffs",
    "generate_emissivity_from_BDRF", "cache_BDRF_Fourier_modes",
    "fourier_modes_from_bdrf", "generate_diff_act_flux_funcs",
    "interpolate", "_compare", "compare",
]
