"""Determinism, NaN-guard, and validation-parity tests.

The framework's analogue of race detection / sanitizers (SURVEY
section 5): jit programs must be bitwise deterministic across runs, the
solver must stay NaN-free under the debug-NaN sanitizer, and the API
boundary must reproduce the reference's validation errors/warnings.
"""

from math import pi

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pythonic_disort_tpu as pdt
from pythonic_disort_tpu.models.disort import eval as ev
from pythonic_disort_tpu.models.disort.api import build_problem
from pythonic_disort_tpu.utils.profiling import nan_guard


def _problem():
    return build_problem(
        tau_arr=np.array([0.5, 1.5]), omega_arr=np.array([0.7, 0.9]),
        NQuad=8, Leg_coeffs_all=np.tile(0.6 ** np.arange(9), (2, 1)),
        mu0=0.7, I0=pi, phi0=0.4, f_arr=np.array([0.6**8, 0.6**8]),
    )[1]


def test_bitwise_determinism():
    problem = _problem()
    tau = jnp.linspace(0.01, 1.99, 17)
    outs = []
    for _ in range(2):
        sol = jax.jit(pdt.solve)(problem)
        outs.append(
            (
                np.asarray(ev.flux_up(sol, tau)),
                np.asarray(ev.flux_down(sol, tau)[0]),
                np.asarray(ev.u0(sol, tau)),
            )
        )
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


def test_nan_free_under_sanitizer():
    problem = _problem()
    with nan_guard():
        sol = pdt.solve(problem)
        out = ev.u0(sol, jnp.linspace(0.0, 2.0, 9))
        assert np.all(np.isfinite(np.asarray(out)))


@pytest.mark.parametrize(
    "bad_kwargs, message",
    [
        (dict(tau_arr=-1.0), "tau values cannot be non-positive."),
        (dict(omega_arr=1.0), "Single-scattering albedo must be between 0 and 1, excluding 1."),
        (dict(NQuad=7), "The number of streams must be even."),
        (dict(mu0=0.0), "The cosine of the polar angle of the incident beam must be between 0 and 1, excluding 0."),
        (dict(I0=-1), "The intensity of the incident beam cannot be negative."),
        (dict(f_arr=2.0), "The fractional scattering must be between 0 and 1."),
        (dict(phi0=7.0), "Provide the principal azimuthal angle for the incident beam (must be between 0 and 2pi, excluding 2pi)."),
    ],
)
def test_validation_messages_match_reference(bad_kwargs, message):
    kwargs = dict(
        tau_arr=1.0, omega_arr=0.5, NQuad=8,
        Leg_coeffs_all=np.array([1.0] + [0] * 8),
        mu0=0.5, I0=pi, phi0=0.0,
    )
    kwargs.update(bad_kwargs)
    with pytest.raises(ValueError) as e:
        build_problem(**kwargs)
    assert str(e.value) == message


def test_leg_coeff_autocorrection_warns():
    with pytest.warns(UserWarning, match="has been corrected to"):
        build_problem(
            tau_arr=1.0, omega_arr=0.5, NQuad=8,
            Leg_coeffs_all=np.array([0.9] + [0.0] * 8),
            mu0=0.5, I0=pi, phi0=0.0,
        )


def test_near_conservative_scattering_warns():
    with pytest.warns(UserWarning, match="very close to 1"):
        build_problem(
            tau_arr=1.0, omega_arr=1 - 1e-8, NQuad=8,
            Leg_coeffs_all=np.array([1.0] + [0.0] * 8),
            mu0=0.5, I0=pi, phi0=0.0,
        )
