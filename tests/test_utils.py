"""Tests for user-facing utilities: mu-interpolation, actinic fluxes,
surface models, thermal helpers, profiling."""

from math import pi

import numpy as np
import pytest

import pythonic_disort_tpu as pdt
from pythonic_disort_tpu.subroutines import (
    generate_diff_act_flux_funcs,
    interpolate,
    Clenshaw_Curtis_quad,
)
from pythonic_disort_tpu.models.surfaces import (
    hapke_fourier_modes, lambertian,
)
from pythonic_disort_tpu.utils.profiling import StageTimer


@pytest.fixture(scope="module")
def solved():
    leg = 0.75 ** np.arange(32)
    return pdt.pydisort(
        tau_arr=2.0, omega_arr=0.8, NQuad=16, Leg_coeffs_all=leg,
        mu0=0.6, I0=pi / 0.6, phi0=0.9 * pi, f_arr=leg[16], NT_cor=False,
        b_pos=1, b_neg=1, BDRF_Fourier_modes=[0.5],
        s_poly_coeffs=np.array([[1.0, 2.0]]),
    )


def test_interpolate_u_exact_at_nodes(solved):
    mu_arr, _, _, u0, u = solved
    u_interp = interpolate(u)
    tau = np.array([0.3, 1.2])
    phi = np.array([0.1, 2.0, 4.0])
    full = u(tau, phi)
    at_nodes = u_interp(mu_arr, tau, phi)
    np.testing.assert_allclose(at_nodes, full, rtol=1e-10)
    # Interpolated values at off-node mu stay within hemisphere bounds
    mu_off = np.array([0.3, -0.45])
    vals = u_interp(mu_off, tau, phi)
    assert np.all(np.isfinite(vals))
    assert vals.shape == (2, 2, 3)


def test_interpolate_u0_dispatch(solved):
    mu_arr, _, _, u0, _ = solved
    u0_interp = interpolate(u0)
    tau = np.array([0.5, 1.5])
    np.testing.assert_allclose(
        u0_interp(mu_arr, tau), u0(tau), rtol=1e-10
    )


def test_actinic_flux_consistency(solved):
    """Actinic fluxes equal the phi-integrated, mu-integrated intensity
    (without the mu weight), cross-checked by quadrature over u."""
    mu_arr, _, _, u0, u = solved
    fact_up, fact_down = generate_diff_act_flux_funcs(u0)
    tau = np.array([0.25, 1.75])
    N = len(mu_arr) // 2
    _, W = np.polynomial.legendre.leggauss(N)
    W = W / 2  # onto [0, 1]
    u0_vals = u0(tau)
    np.testing.assert_allclose(
        fact_up(tau), 2 * pi * W @ u0_vals[:N], rtol=1e-10
    )
    assert np.all(np.isfinite(fact_down(tau)))


def test_hapke_modes_shape():
    modes = hapke_fourier_modes(3)
    mu = np.linspace(0.1, 1, 4)
    out = modes[0](mu, mu)
    assert out.shape == (4, 4)
    assert np.all(np.isfinite(out))
    assert lambertian(0.2) == [0.2]


def test_stage_timer():
    t = StageTimer()
    with t.stage("a"):
        sum(range(1000))
    rep = t.report()
    assert "a" in rep


def test_set_kernel_flags_clears_caches(monkeypatch):
    """The kernel-dispatch env knobs are read at TRACE time; the
    supported mid-process flip is `config.set_kernel_flags`, which must
    write the env var AND drop the jit caches (a raw env mutation after
    a program is cached silently does nothing - documented in README)."""
    import os

    import jax

    from pythonic_disort_tpu import config as cfg

    calls = []
    monkeypatch.setattr(jax, "clear_caches", lambda: calls.append(1))
    monkeypatch.setenv("PYDISORT_TPU_PALLAS", "1")
    monkeypatch.setenv("PYDISORT_TPU_FUSED_BVP", "1")

    cfg.set_kernel_flags(pallas=False)
    assert os.environ["PYDISORT_TPU_PALLAS"] == "0"
    assert len(calls) == 1

    # no-op flip (same value) must NOT drop the caches
    cfg.set_kernel_flags(pallas=False)
    assert len(calls) == 1

    cfg.set_kernel_flags(pallas=True, fused_bvp=False)
    assert os.environ["PYDISORT_TPU_PALLAS"] == "1"
    assert os.environ["PYDISORT_TPU_FUSED_BVP"] == "0"
    assert len(calls) == 2

    # the dispatch predicate reads the env var at call (trace) time
    from pythonic_disort_tpu.ops import blocktri

    monkeypatch.setenv("PYDISORT_TPU_PALLAS", "0")
    assert not blocktri._use_pallas(32, "float32")
