"""Golden-file verification against Stamnes' DISORT 4.0.99 outputs.

Data-driven port of the reference verification strategy (reference
``pydisotest/{1..9}_test.py``): each case is a ``pydisort`` argument
set plus a golden ``.npz``; thresholds per ``tests/helpers.py``.
"""

import os
from math import pi

import numpy as np
import pytest

from pythonic_disort_tpu.subroutines import (
    blackbody_contrib_to_BCs,
    generate_emissivity_from_BDRF,
    generate_s_poly_coeffs,
)
from helpers import DATA, run_and_compare


def iso_phase(nleg):
    leg = np.zeros(nleg)
    leg[0] = 1
    return leg


def rayleigh_phase(nleg):
    leg = np.zeros(nleg)
    leg[0] = 1
    leg[2] = 0.1
    return leg


def hapke_bdrf_modes(nmodes, B0=1.0, HH=0.06, W=0.6, nphi=512):
    """Fourier cosine modes of the Hapke BDRF used by the reference
    tests (cf. ``pydisotest/6_test.py:11-24``, ``7_test.py`` test_7e)."""

    def hapke(mu, neg_mup, dphi):
        cos_alpha = (
            mu[:, None] * neg_mup[None, :]
            - np.sqrt(1 - mu**2)[:, None]
            * np.sqrt((1 - neg_mup**2))[None, :]
            * np.cos(dphi)
        ).clip(-1, 1)
        alpha = np.arccos(cos_alpha)
        P = 1 + cos_alpha / 2
        B = B0 * HH / (HH + np.tan(alpha / 2))
        gamma = np.sqrt(1 - W)
        H0 = ((1 + 2 * neg_mup) / (1 + 2 * neg_mup * gamma))[None, :]
        H = ((1 + 2 * mu) / (1 + 2 * mu * gamma))[:, None]
        return W / 4 / (mu[:, None] + neg_mup[None, :]) * ((1 + B) * P + H0 * H - 1)

    from pythonic_disort_tpu.utils.bdrf import fourier_modes_from_bdrf

    return fourier_modes_from_bdrf(hapke, nmodes, nphi)


def _family_9_tau():
    return np.array([np.arange(i + 2).sum() for i in range(6)], dtype=np.float64)


def _test9_sources(omega_s=0.5):
    tau_arr = _family_9_tau()
    TEMPER = 600 + np.arange(7) * 10.0
    s_poly = generate_s_poly_coeffs(tau_arr, TEMPER, 999, 1000)
    b_pos = blackbody_contrib_to_BCs(700, 999, 1000) * (1 - omega_s)
    b_neg = blackbody_contrib_to_BCs(550, 999, 1000) + 1
    return s_poly, b_pos, b_neg


CASES = {}

# ---- Family 1: isotropic scattering, single layer, beam ----
for name, tau, omega in [
    ("1a", 0.03125, 0.2), ("1b", 0.03125, 1 - 1e-6), ("1c", 0.03125, 0.99),
    ("1d", 32, 0.2), ("1e", 32, 1 - 1e-6), ("1f", 32, 0.99),
]:
    CASES[name] = dict(
        kwargs=dict(
            tau_arr=tau, omega_arr=omega, NQuad=16,
            Leg_coeffs_all=iso_phase(17), mu0=0.1, I0=pi / 0.1, phi0=pi,
        )
    )

# ---- Family 2: Rayleigh-like scattering + beam ----
for name, tau, omega in [
    ("2a", 0.2, 0.5), ("2b", 0.2, 1 - 1e-6), ("2c", 5, 0.5), ("2d", 5, 1 - 1e-6),
]:
    CASES[name] = dict(
        kwargs=dict(
            tau_arr=tau, omega_arr=omega, NQuad=16,
            Leg_coeffs_all=rayleigh_phase(17), mu0=0.080442, I0=pi, phi0=pi,
        )
    )

# ---- Family 3: Henyey-Greenstein, delta-M + NT corrections ----
_hg = 0.75 ** np.arange(32)
for name, tau in [("3a", 1), ("3b", 8)]:
    CASES[name] = dict(
        kwargs=dict(
            tau_arr=tau, omega_arr=1 - 1e-6, NQuad=16, Leg_coeffs_all=_hg,
            mu0=1, I0=pi, phi0=pi, f_arr=_hg[16], NT_cor=True,
        )
    )

# ---- Family 4: Haze-L phase function, delta-M + NT ----
_haze = np.load(os.path.join(DATA, "leg_coeffs_4.npy")) / (2 * np.arange(83) + 1)
for name, omega, mu0 in [("4a", 1 - 1e-6, 1), ("4b", 0.9, 1), ("4c", 0.9, 0.5)]:
    CASES[name] = dict(
        kwargs=dict(
            tau_arr=1, omega_arr=omega, NQuad=32, Leg_coeffs_all=_haze,
            mu0=mu0, I0=pi, phi0=pi, f_arr=_haze[32], NT_cor=True,
        )
    )

# ---- Family 5: Cloud C.1 phase function (299 coeffs), thick layer ----
_cloud = np.load(os.path.join(DATA, "leg_coeffs_5.npy")) / (2 * np.arange(300) + 1)
for name, omega in [("5a", 1 - 1e-6), ("5b", 0.9)]:
    CASES[name] = dict(
        kwargs=dict(
            tau_arr=64, omega_arr=omega, NQuad=48, Leg_coeffs_all=_cloud,
            mu0=1, I0=pi, phi0=pi, f_arr=_cloud[48], NT_cor=True,
        ),
        deg_around_beam=10,
    )

# ---- Family 8: two-layer isotropic media, isotropic top source ----
for name, tau, omega in [
    ("8a", [0.25, 0.5], [0.5, 0.3]),
    ("8b", [0.25, 0.5], [0.8, 0.95]),
    ("8c", [1, 3], [0.8, 0.95]),
]:
    CASES[name] = dict(
        kwargs=dict(
            tau_arr=np.array(tau, dtype=np.float64),
            omega_arr=np.array(omega, dtype=np.float64),
            NQuad=8,
            Leg_coeffs_all=np.tile(iso_phase(9), (2, 1)),
            mu0=0, I0=0, phi0=0, b_neg=1 / pi,
        )
    )

# ---- Family 9: six-layer general media ----
_tau9 = _family_9_tau()
_omega9 = 0.6 + np.arange(1, 7) * 0.05
CASES["9a"] = dict(
    kwargs=dict(
        tau_arr=_tau9, omega_arr=_omega9, NQuad=8,
        Leg_coeffs_all=np.tile(iso_phase(9), (6, 1)),
        mu0=0, I0=0, phi0=0, b_neg=1 / pi,
    )
)
CASES["9b"] = dict(
    kwargs=dict(
        tau_arr=_tau9, omega_arr=_omega9, NQuad=8,
        Leg_coeffs_all=np.tile(
            np.array([1, 2.00916, 1.56339, 0.67407, 0.22215, 0.04725,
                      0.00671, 0.00068, 0.00005]) / (2 * np.arange(9) + 1),
            (6, 1),
        ),
        mu0=0, I0=0, phi0=0, b_neg=1 / pi,
    )
)


def _case_9c():
    s_poly, b_pos, b_neg = _test9_sources()
    return dict(
        kwargs=dict(
            tau_arr=_tau9, omega_arr=_omega9, NQuad=8,
            Leg_coeffs_all=np.vstack(
                [(l / 7) ** np.arange(9) for l in np.arange(1, 7)]
            ),
            mu0=0.5, I0=pi, phi0=0,
            BDRF_Fourier_modes=[
                lambda mu, neg_mup: np.full((len(mu), len(neg_mup)), 0.5)
            ],
            s_poly_coeffs=s_poly, b_pos=b_pos, b_neg=b_neg,
        )
    )


CASES["9c"] = _case_9c


@pytest.mark.parametrize("name", sorted(CASES))
def test_stamnes_case(name):
    case = CASES[name]
    if callable(case):
        case = case()
    run_and_compare(name, case["kwargs"], case.get("deg_around_beam", 0))
