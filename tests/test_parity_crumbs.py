"""Small-parity items: compat-namespace helpers and the complete
validation-check list (VERDICT round 1, item 8).

The validation audit extracts every ValueError / warning message string
from the reference's input-check block (reference ``pydisort.py``) and
asserts each one exists verbatim in this framework's API layer.
"""

import re
import sys
import warnings

import numpy as np
import pytest

sys.path.insert(0, "/root/reference/src")

REF_PYDISORT = "/root/reference/src/PythonicDISORT/pydisort.py"
OUR_API = None


def _our_api_source():
    global OUR_API
    if OUR_API is None:
        import pythonic_disort_tpu.models.disort.api as api

        OUR_API = open(api.__file__).read()
    return OUR_API


def test_validation_message_parity():
    """Every reference validation/warning message exists in our API."""
    src = open(REF_PYDISORT).read()
    msgs = re.findall(r'(?:ValueError|warnings\.warn)\(\s*"((?:[^"\\]|\\.)*)"', src)
    assert len(msgs) >= 20, f"expected >=20 reference messages, got {len(msgs)}"
    ours = _our_api_source()
    missing = [m for m in msgs if m.split("`NFourier` is large")[0] not in ours]
    assert not missing, f"validation messages missing from api.py: {missing}"


def test_use_banded_solver_threshold():
    import pythonic_disort_tpu as pdt

    leg = np.zeros(17)
    leg[0] = 1
    with pytest.raises(ValueError, match="use_banded_solver_NLayers"):
        pdt.pydisort(1.0, 0.5, 16, leg, 0.5, np.pi, 0.0,
                     use_banded_solver_NLayers=2)


def test_nscoeffs_warning():
    from pythonic_disort_tpu.models.disort.api import build_problem

    leg = np.zeros(17)
    leg[0] = 1
    s_poly = np.ones((1, 11))
    with pytest.warns(UserWarning, match="`Nscoeffs` is large"):
        build_problem(1.0, 0.5, 16, leg, 0.5, np.pi, 0.0,
                      s_poly_coeffs=s_poly)


def test_mathscr_v_matches_reference():
    """Compat `_mathscr_v` reproduces reference `subroutines._mathscr_v`
    (general Nscoeffs path) on random inputs."""
    from PythonicDISORT.subroutines import _mathscr_v as ref_mathscr_v
    from pythonic_disort_tpu.subroutines import _mathscr_v

    rng = np.random.default_rng(7)
    NL, NQuad, Ns, Ntau = 3, 8, 4, 11
    tau = rng.uniform(0, 3, Ntau)
    scale_tau = rng.uniform(0.5, 1.0, NL)
    l = rng.integers(0, NL, Ntau)
    s_poly = rng.standard_normal((NL, Ns))
    G = rng.standard_normal((NL, NQuad, NQuad))
    K = rng.uniform(0.5, 3.0, (NL, NQuad)) * np.where(
        np.arange(NQuad) < NQuad // 2, -1, 1
    )
    G_inv_mu_inv = rng.standard_normal((NL, NQuad))

    ours = _mathscr_v(tau, scale_tau, l, Ns, s_poly, G, K, G_inv_mu_inv)
    theirs = ref_mathscr_v(tau, scale_tau, l, Ns, s_poly, G, K, G_inv_mu_inv)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12, atol=1e-12)

    # antiderivative variant accepts BOTH conventions: per-layer
    # scale_tau (this framework's documented shape) and pre-gathered
    # per tau point (what reference call sites pass) — ADVICE r2 item 4.
    theirs_ad = ref_mathscr_v(tau, scale_tau[l][:, None], l, Ns, s_poly, G, K,
                              G_inv_mu_inv, is_antiderivative_wrt_tau=True)
    ours_ad = _mathscr_v(tau, scale_tau, l, Ns, s_poly, G, K, G_inv_mu_inv,
                         is_antiderivative_wrt_tau=True)
    np.testing.assert_allclose(ours_ad, theirs_ad, rtol=1e-12, atol=1e-12)
    ours_pre = _mathscr_v(tau, scale_tau[l][:, None], l, Ns, s_poly, G, K,
                          G_inv_mu_inv, is_antiderivative_wrt_tau=True)
    np.testing.assert_allclose(ours_pre, theirs_ad, rtol=1e-12, atol=1e-12)


def test_affine_transform_poly_coeffs_matches_reference():
    from PythonicDISORT.subroutines import (
        affine_transform_poly_coeffs as ref_fn,
    )
    from pythonic_disort_tpu.subroutines import affine_transform_poly_coeffs

    rng = np.random.default_rng(3)
    L, Nc = 5, 4
    coeffs = rng.standard_normal((L, Nc))
    a = rng.uniform(0.5, 2.0, L)
    b = rng.uniform(-1.0, 1.0, L)
    ours = np.asarray(affine_transform_poly_coeffs(coeffs, a, b))
    theirs = ref_fn(coeffs, a, b)
    np.testing.assert_allclose(ours, theirs, rtol=1e-10, atol=1e-12)
