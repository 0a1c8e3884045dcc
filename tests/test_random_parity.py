"""Randomized feature-matrix parity vs the live reference.

The golden files all have uniform single-scattering albedo per case, so
delta-M bugs tied to LAYER-VARYING omega/f are invisible to them (one
such bug shipped in r3 and was found by a notebook, not a test).  This
sweeps randomized multi-layer atmospheres with layer-varying
everything across the feature combinations (beam x iso-source x BDRF x
delta-M), asserting flux and intensity parity with PythonicDISORT at
rtol = 1e-6.  Shapes are held fixed across cases so the jitted solve
compiles once.
"""

import sys
import warnings
from math import pi

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

try:
    import PythonicDISORT
except Exception:  # pragma: no cover
    PythonicDISORT = None

pytestmark = pytest.mark.skipif(
    PythonicDISORT is None, reason="reference not importable"
)

NQ, L, NLA = 16, 5, 24

FEATURES = [
    # (name, beam, iso, bdrf, deltam)
    ("beam", True, False, False, False),
    ("beam_deltam", True, False, False, True),
    ("beam_iso_deltam", True, True, False, True),
    ("beam_bdrf_deltam", True, False, True, True),
    ("iso_only", False, True, False, False),
    ("everything", True, True, True, True),
]


def _case(seed, beam, iso, bdrf, deltam):
    rng = np.random.default_rng(seed)
    tau_arr = np.cumsum(rng.uniform(0.15, 0.9, L))
    omega_arr = rng.uniform(0.2, 0.95, L)           # layer-varying
    g = rng.uniform(0.3, 0.85, L)                   # layer-varying
    leg = g[:, None] ** np.arange(NLA)[None, :]
    kwargs = dict(
        tau_arr=tau_arr, omega_arr=omega_arr, NQuad=NQ,
        Leg_coeffs_all=leg,
        mu0=float(rng.uniform(0.3, 1.0)) if beam else 0.0,
        I0=pi if beam else 0.0,
        phi0=float(rng.uniform(0, 2 * pi)) if beam else 0.0,
    )
    if deltam:
        kwargs["f_arr"] = leg[:, NQ]                # layer-varying f
    if iso:
        kwargs["s_poly_coeffs"] = rng.uniform(0.005, 0.15, (L, 2))
        kwargs["b_pos"] = float(rng.uniform(0, 0.3))
        kwargs["b_neg"] = float(rng.uniform(0, 0.3))
    if bdrf:
        a = float(rng.uniform(0.1, 0.6))
        kwargs["BDRF_Fourier_modes"] = [
            lambda mu, neg_mup, a=a: np.full((len(mu), len(neg_mup)), a)
        ]
    return kwargs


@pytest.mark.parametrize("name,beam,iso,bdrf,deltam", FEATURES,
                         ids=[f[0] for f in FEATURES])
@pytest.mark.parametrize("seed", [11, 29])
def test_random_feature_parity(name, beam, iso, bdrf, deltam, seed):
    import pythonic_disort_tpu as pdt

    kwargs = _case(seed, beam, iso, bdrf, deltam)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ours = pdt.pydisort(**kwargs)
        ref = PythonicDISORT.pydisort(**kwargs)

    tau = np.linspace(0, float(kwargs["tau_arr"][-1]), 13) * (1 - 1e-12)
    phi = np.array([0.4, 3.9])

    r_fu = np.asarray(ref[1](tau))
    o_fu = np.asarray(ours[1](tau))
    r_fd, r_dir = (np.asarray(x) for x in ref[2](tau))
    o_fd, o_dir = (np.asarray(x) for x in ours[2](tau))
    scale = max(np.abs(r_fu).max(), np.abs(r_fd).max(), 1e-12)
    for lbl, o, r in [("flux_up", o_fu, r_fu),
                      ("flux_down", o_fd, r_fd),
                      ("flux_dir", o_dir, r_dir)]:
        np.testing.assert_allclose(
            o, r, rtol=1e-6, atol=1e-8 * scale,
            err_msg=f"{name}/seed{seed}: {lbl}",
        )

    # intensity (the NT-corrected u when delta-M+beam active, else u)
    o_u = np.asarray(ours[4](tau, phi))
    r_u = np.asarray(ref[4](tau, phi))
    np.testing.assert_allclose(
        o_u, r_u, rtol=2e-6, atol=1e-8 * max(np.abs(r_u).max(), 1e-12),
        err_msg=f"{name}/seed{seed}: intensity",
    )
