"""Lanes-layout batched solve == vmapped per-column solve.

`batch_solve.solve_batched` reimplements the whole pipeline in the
batch-in-lanes layout; these tests pin it to the independently tested
per-column `solve` (vmapped) across the feature matrix: beam/iso
sources, BDRF, delta-M, single/multi layer, NFourier 1 and >1, and
both flux and intensity outputs.  f64 on CPU so agreement is to
roundoff.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pythonic_disort_tpu import DisortConfig
from pythonic_disort_tpu.models.disort import eval as ev
from pythonic_disort_tpu.models.disort.batch_solve import solve_batched
from pythonic_disort_tpu.parallel import make_batched_problem
from pythonic_disort_tpu.parallel.batch import solve_vmapped


def _problem(nlayers, nfourier, beam, iso, bdrf, deltam, only_flux,
             S=3, nquad=8, seed=0):
    rng = np.random.default_rng(seed)
    N = nquad // 2
    nleg = nquad
    nleg_all = nquad + 1
    thickness = rng.uniform(0.1, 0.7, (S, nlayers))
    tau = np.cumsum(thickness, axis=1)
    omega = rng.uniform(0.2, 0.9, (S, nlayers))
    g = rng.uniform(0.2, 0.8, (S, nlayers))
    leg = g[..., None] ** np.arange(nleg_all)[None, None, :]
    f_arr = leg[..., nquad] if deltam else None
    mu0 = rng.uniform(0.3, 0.9, S) if beam else np.zeros(S)
    I0 = np.full(S, np.pi) if beam else np.zeros(S)
    phi0 = rng.uniform(0, 2 * np.pi, S) if beam else np.zeros(S)
    ns = 3 if iso else 0
    s_poly = rng.uniform(0.1, 1.0, (S, nlayers, 3)) if iso else None
    nb = 1 if bdrf else 0
    bdrf_modes = (
        np.broadcast_to(
            rng.uniform(0.1, 0.4, (S, 1, 1, 1)), (S, 1, N, N)
        ).copy()
        if bdrf
        else None
    )
    bdrf_mu0 = (
        np.broadcast_to(
            bdrf_modes[:, :, 0, 0][..., None], (S, 1, N)
        ).copy()
        if bdrf
        else None
    )
    config = DisortConfig(
        nquad=nquad, nleg=nleg, nleg_all=nleg_all, nfourier=nfourier,
        nlayers=nlayers, nscoeffs=ns, nbdrf=nb, has_beam=beam,
        only_flux=only_flux, has_deltam=deltam,
    )
    problem = make_batched_problem(
        config, tau, omega, leg, mu0, I0, phi0=phi0, f_arr=f_arr,
        s_poly_coeffs=s_poly, bdrf_modes=bdrf_modes,
        bdrf_modes_mu0=bdrf_mu0, dtype=jnp.float64,
    )
    return problem, np.asarray(tau)


CASES = [
    # (nlayers, nfourier, beam, iso, bdrf, deltam, only_flux)
    (4, 1, True, False, False, True, True),      # headline: flux, delta-M beam
    (4, 1, True, False, False, False, True),     # no delta-M
    (1, 1, True, False, False, True, True),      # single layer
    (4, 1, False, True, False, False, True),     # iso source only
    (4, 1, True, True, True, True, True),        # everything, flux
    (4, 4, True, False, True, True, False),      # intensity, BDRF
    (4, 4, True, True, False, True, False),      # intensity, iso+beam
    (1, 4, True, True, True, True, False),       # single layer, everything
]


@pytest.mark.parametrize(
    "nlayers,nfourier,beam,iso,bdrf,deltam,only_flux", CASES
)
def test_batched_matches_vmapped(nlayers, nfourier, beam, iso, bdrf,
                                 deltam, only_flux):
    problem, tau = _problem(
        nlayers, nfourier, beam, iso, bdrf, deltam, only_flux
    )
    sol_l = jax.jit(solve_batched)(problem)
    sol_v = jax.jit(solve_vmapped)(problem)

    # Spectral data: K is order-sensitive but both paths use the same
    # rotation schedule -> identical column order.
    np.testing.assert_allclose(
        np.asarray(sol_l.K), np.asarray(sol_v.K), rtol=1e-10, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.B), np.asarray(sol_v.B), rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(sol_l.mathscr_b), np.asarray(sol_v.mathscr_b),
        rtol=1e-9, atol=1e-12,
    )
    for f in ("fvec_up", "fvec_dn", "fb_up", "fb_dn", "fi_up", "fi_dn",
              "scaled_tau_with_0", "scale_tau", "rescale_factor"):
        np.testing.assert_allclose(
            np.asarray(getattr(sol_l, f)), np.asarray(getattr(sol_v, f)),
            rtol=1e-9, atol=1e-13, err_msg=f,
        )
    if only_flux:
        assert sol_l.G is None and sol_l.GC is None
    else:
        # G is never materialized on the batched path (nothing
        # downstream consumes it); GC is stored layer-flattened.
        assert sol_l.G is None
        np.testing.assert_allclose(
            np.asarray(sol_l.GC), np.asarray(sol_v.GC), rtol=1e-9, atol=1e-12
        )

    # End-to-end outputs at interior + boundary points.
    tau_eval = jnp.asarray(
        np.concatenate(
            [tau * 0.5, tau, np.zeros((tau.shape[0], 1))], axis=1
        )
    )
    fup_l = jax.vmap(ev.flux_up)(sol_l, tau_eval)
    fup_v = jax.vmap(ev.flux_up)(sol_v, tau_eval)
    np.testing.assert_allclose(
        np.asarray(fup_l), np.asarray(fup_v), rtol=1e-9, atol=1e-13
    )
    fdn_l = jax.vmap(ev.flux_down)(sol_l, tau_eval)
    fdn_v = jax.vmap(ev.flux_down)(sol_v, tau_eval)
    for a, b in zip(fdn_l, fdn_v):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-13
        )
    if not only_flux:
        phi = jnp.asarray(
            np.broadcast_to(np.linspace(0, 2 * np.pi, 3), (tau.shape[0], 3))
        )
        u_l = jax.vmap(ev.u)(sol_l, tau_eval, phi)
        u_v = jax.vmap(ev.u)(sol_v, tau_eval, phi)
        np.testing.assert_allclose(
            np.asarray(u_l), np.asarray(u_v), rtol=1e-9, atol=1e-12
        )


def test_batched_grad_matches_vmapped_grad():
    """d(flux_up)/d(omega) agrees between the two implementations."""
    problem, tau = _problem(3, 1, True, False, False, True, True, S=2)
    tau_eval = jnp.asarray(tau)

    def loss(impl, om):
        p = type(problem)(
            **{**problem.__dict__, "omega_arr": om}
        )
        sol = impl(p)
        return jnp.sum(jax.vmap(ev.flux_up)(sol, tau_eval))

    g_l = jax.grad(lambda om: loss(solve_batched, om))(problem.omega_arr)
    g_v = jax.grad(lambda om: loss(solve_vmapped, om))(problem.omega_arr)
    np.testing.assert_allclose(
        np.asarray(g_l), np.asarray(g_v), rtol=1e-7, atol=1e-10
    )


@pytest.mark.parametrize(
    "nlayers,nfourier,beam,iso,bdrf,deltam",
    [
        (4, 4, True, False, True, True),
        (4, 4, True, True, False, True),
        (1, 4, True, True, True, True),
        (4, 1, False, True, False, False),
    ],
)
def test_boundary_probe_intensity_matches_general_path(
    nlayers, nfourier, beam, iso, bdrf, deltam
):
    """probes_per_layer=True (lanes-contracted modes, no padded GC)
    equals the general gather-based path at one probe per layer."""
    from pythonic_disort_tpu.parallel.batch import solve_intensity

    problem, tau = _problem(nlayers, nfourier, beam, iso, bdrf, deltam,
                            only_flux=False)
    tau_eval = jnp.asarray(tau * (1.0 - 1e-9))
    S = tau.shape[0]
    phi_eval = jnp.broadcast_to(
        jnp.asarray([0.3, 1.7, 4.1], jnp.float64), (S, 3)
    )
    for ntc in (False, True) if (beam and deltam) else (False,):
        u_gen = jax.jit(
            solve_intensity, static_argnames=("nt_correct",)
        )(problem, tau_eval, phi_eval, nt_correct=ntc)
        u_fast = jax.jit(
            solve_intensity,
            static_argnames=("nt_correct", "probes_per_layer"),
        )(problem, tau_eval, phi_eval, nt_correct=ntc,
          probes_per_layer=True)
        np.testing.assert_allclose(
            np.asarray(u_fast), np.asarray(u_gen), rtol=1e-10, atol=1e-12
        )
