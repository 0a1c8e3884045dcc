"""ARTS longwave verification (reference ``pydisotest/8_test.py``
tests 8ARTS_A and 8ARTS_B): 101 pure-absorption atmospheres with linear
sources, and a 48-layer 40-stream microwave atmosphere at 3 frequencies."""

import os
from math import pi

import numpy as np
from scipy.constants import speed_of_light

import pythonic_disort_tpu as pdt
from pythonic_disort_tpu.subroutines import (
    blackbody_contrib_to_BCs,
    generate_s_poly_coeffs,
)
from helpers import DATA, STAMNES, load_golden


def test_8ARTS_A():
    data = np.load(os.path.join(DATA, "arts_A.npz"))
    src, tau = data["src"], data["tau"]            # (101, 20, 2), (101, 20)
    nv = src.shape[0]
    surface_intensity = np.empty(nv)
    for i in range(nv):
        _, flux_up, flux_down, u0, u = pdt.pydisort(
            tau_arr=tau[i],
            omega_arr=tau[i] * 0,
            NQuad=8,
            Leg_coeffs_all=np.ones((len(tau[i]), 1)),
            I0=0.0, mu0=0.0, phi0=0.0,
            NLeg=1, NFourier=1,
            s_poly_coeffs=src[i] * 1e15,
        )
        surface_intensity[i] = u(tau[i], 0.0).T[-1, -1]
    ref = np.load(os.path.join(STAMNES, "8ARTS_A_test.npy"))
    assert np.max(np.abs(surface_intensity - ref) / ref) < 1e-2


def test_8ARTS_B():
    data = np.load(os.path.join(DATA, "arts_B.npz"))
    freqs = [31.5e9, 165e9, 666e9]
    for ifreq in range(3):
        tau_arr = data["optical_thicknesses"][ifreq]
        omega_arr = data["single_scattering_albedo"][ifreq]
        NQuad = int(data["quadrature_dimension"])
        Leg_coeffs_all = np.hstack(
            [data["legendre_coefficients"][ifreq], np.zeros((len(tau_arr), 1))]
        )
        TEMPER = data["TEMPER"]
        s_poly_coeffs = generate_s_poly_coeffs(tau_arr, TEMPER, 0.0, 50000.0)
        b_pos = blackbody_contrib_to_BCs(np.mean(TEMPER), 0.0, 50000.0)
        b_neg = blackbody_contrib_to_BCs(np.median(TEMPER), 0.0, 50000.0)

        mu_arr, flux_up, flux_down, u0, u = pdt.pydisort(
            tau_arr, omega_arr, NQuad, Leg_coeffs_all,
            0, 0, 0, b_pos=b_pos, b_neg=b_neg, s_poly_coeffs=s_poly_coeffs,
        )

        results = load_golden(f"8ARTS_B{ifreq}")
        reorder_mu = np.argsort(mu_arr)
        uu = results["uu"]
        tau_test_arr = results["tau_test_arr"]
        phi_arr = results["phi_arr"]
        u_cache = u(tau_test_arr, phi_arr)[reorder_mu].reshape(np.shape(uu))
        diff = np.abs(uu - u_cache)
        diff_ratio = np.divide(
            diff, np.abs(uu), out=np.zeros_like(diff), where=uu != 0
        )
        assert np.max(diff_ratio[diff > 1e-3], initial=0) < 1e-2
        fu = flux_up(tau_test_arr)
        fd, fdir = flux_down(tau_test_arr)
        for ref, ours in [
            (results["flup"], fu), (results["rfldn"], fd), (results["rfldir"], fdir)
        ]:
            d = np.abs(ref - ours)
            r = np.divide(d, np.abs(ref), out=np.zeros_like(d), where=ref != 0)
            assert np.max(r[d > 1e-3], initial=0) < 1e-3
