"""Mathematical self-consistency tests.

- Single thick layer vs 16 identical sublayers with every feature on
  (reference ``pydisotest/11_test.py``).
- Antiderivative outputs vs adaptive quadrature of the pointwise
  outputs (reference ``pydisotest/I_test.py``).
"""

from math import pi

import numpy as np
from scipy.integrate import quad, quad_vec

import pythonic_disort_tpu as pdt
from pythonic_disort_tpu.subroutines import Clenshaw_Curtis_quad


def _full_feature_kwargs(tau_arr, nlayers, s_coeffs):
    leg = np.tile(0.75 ** np.arange(32), (nlayers, 1))
    return dict(
        tau_arr=tau_arr,
        omega_arr=np.full(nlayers, 0.8),
        NQuad=16,
        Leg_coeffs_all=leg if nlayers > 1 else leg[0],
        mu0=0.6, I0=pi / 0.6, phi0=0.9 * pi,
        b_pos=1, b_neg=1,
        f_arr=np.full(nlayers, leg[0, 16]) if nlayers > 1 else leg[0, 16],
        BDRF_Fourier_modes=[
            lambda mu, neg_mup: np.full((len(mu), len(neg_mup)), 1.0)
        ],
        s_poly_coeffs=np.tile(s_coeffs, (nlayers, 1)) if nlayers > 1 else s_coeffs,
        NT_cor=True,
    )


def test_single_vs_multi_layer():
    tau_arr = np.arange(16) / 2 + 0.5
    rng = np.random.default_rng(11)
    tau_test_arr = np.sort(rng.random(100) * tau_arr[-1])
    Nphi = int((16 * pi) // 2) * 2 + 1
    phi_arr, _ = Clenshaw_Curtis_quad(Nphi)

    s = np.array([6.0, 7.0])
    fu1, fd1, _, u1 = pdt.pydisort(**_full_feature_kwargs(tau_arr[-1], 1, s))[1:]
    fu16, fd16, _, u16 = pdt.pydisort(**_full_feature_kwargs(tau_arr, 16, s))[1:]

    assert np.allclose(fu1(tau_test_arr), fu16(tau_test_arr))
    assert np.allclose(fd1(tau_test_arr), fd16(tau_test_arr))
    assert np.allclose(u1(tau_test_arr, phi_arr), u16(tau_test_arr, phi_arr))


def _antiderivative_case(s_coeffs):
    kwargs = _full_feature_kwargs(np.array([8.0]), 1, s_coeffs)
    kwargs["BDRF_Fourier_modes"] = [1]
    flux_up, flux_down, u0, u = pdt.pydisort(**kwargs)[1:]
    Nphi = int((16 * pi) // 2) * 2 + 1
    phi_arr, _ = Clenshaw_Curtis_quad(Nphi)
    end = 8.0
    assert np.allclose(
        quad_vec(lambda tau: u(tau, phi_arr), 0, end)[0],
        u(end, phi_arr, True) - u(0, phi_arr, True),
    )
    assert np.allclose(quad_vec(u0, 0, end)[0], u0(end, True) - u0(0, True))
    assert np.allclose(
        quad(flux_up, 0, end)[0], flux_up(end, True) - flux_up(0, True)
    )
    assert np.allclose(
        quad(lambda tau: flux_down(tau)[0], 0, end)[0],
        flux_down(end, True)[0] - flux_down(0, True)[0],
    )
    assert np.allclose(
        quad(lambda tau: flux_down(tau)[1], 0, end)[0],
        flux_down(end, True)[1] - flux_down(0, True)[1],
    )


def test_antiderivative_constant_source():
    _antiderivative_case(np.array([1.0]))


def test_antiderivative_linear_source():
    _antiderivative_case(np.array([1.0, 2.0]))


def test_antiderivative_cubic_source():
    _antiderivative_case(np.array([1.0, 2.0, 3.0, 4.0]))
