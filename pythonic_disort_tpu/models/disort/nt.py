"""Nakajima-Tanaka (TMS/IMS) intensity corrections.

Capability parity with reference ``pydisort.py:375-698``: the delta-M
solution's intensity is corrected by (a) TMS — replacing the truncated
single-scatter contribution with the exact one computed from the full
phase function, accumulated across layers via cumulative products of
per-layer decay factors — and (b) IMS — removing the secondary-
scattering overshoot around the beam for downward directions.  Fluxes
are never corrected (the delta-M fluxes are already accurate).

All functions here are pure and jittable (static antiderivative flag);
the reference's data-dependent branches (``any_pos`` / ``any_neg``,
``pydisort.py:490-491``) are unconditional masked computations so the
program stays static for XLA.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ...ops.legendre import legendre_series
from .eval import _layer_index, _scaled_tau
from .types import DisortSolution


def _nu(mu, phi, mu_p, phi_p):
    """cos of scattering angle; (len(mu), len(phi))."""
    s = jnp.sqrt(1.0 - mu**2)
    s_p = jnp.sqrt(1.0 - mu_p**2)
    return mu_p * mu[:, None] + s_p * s[:, None] * jnp.cos(phi_p - phi)[None, :]


def nt_correction(sol: DisortSolution, tau, phi, antiderivative: bool = False):
    """TMS + IMS correction to the intensity; (2N, Ntau, Nphi), pre-rescale."""
    cfg = sol.config
    N = cfg.n
    L = cfg.nlayers
    tau = jnp.atleast_1d(tau)
    phi = jnp.atleast_1d(phi)
    dtype = tau.dtype

    mu_pos = sol.mu_arr_pos
    M_inv = 1.0 / mu_pos
    mu_arr = jnp.concatenate([mu_pos, -mu_pos])
    mu0, phi0 = sol.mu0, sol.phi0
    I0_div_4pi = sol.I0 / (4.0 * math.pi)

    l = _layer_index(sol, tau)
    st = _scaled_tau(sol, tau, l)
    tau_w0 = sol.scaled_tau_with_0
    st_bot = tau_w0[1:][l]
    st_top = tau_w0[l]
    scaled_thickness = tau_w0[1:] - tau_w0[:-1]            # (L,)

    # ---- TMS (reference pydisort.py:409-597) ----
    nu = _nu(mu_arr, phi, -mu0, phi0)                      # (2N, Nphi)
    # Exact and truncated phase functions per layer at the beam angles
    p_true = legendre_series(sol.weighted_leg_all, nu)     # (L, 2N, Nphi)
    p_trun = legendre_series(sol.weighted_scaled_leg, nu)  # (L, 2N, Nphi)
    mathscr_B_layers = (
        (sol.scaled_omega_arr * I0_div_4pi)[:, None, None]
        * (mu0 / (mu0 + mu_arr))[None, :, None]
        * (p_true / (1.0 - sol.f_arr)[:, None, None] - p_trun)
    )                                                       # (L, 2N, Nphi)
    mathscr_B = mathscr_B_layers[l]                         # (Ntau, 2N, Nphi)

    neg_st_div_mu0 = -st / mu0
    scale_l = sol.scale_tau[l]
    if antiderivative:
        base = jnp.exp(neg_st_div_mu0) / (-scale_l / mu0)
        tms_pos = base[None, :] - jnp.exp(
            (st - st_bot)[None, :] * M_inv[:, None] - st_bot[None, :] / mu0
        ) / (scale_l[None, :] * M_inv[:, None])
        tms_neg = base[None, :] + jnp.exp(
            (st_top - st)[None, :] * M_inv[:, None] - st_top[None, :] / mu0
        ) / (scale_l[None, :] * M_inv[:, None])
    else:
        base = jnp.exp(neg_st_div_mu0)
        tms_pos = base[None, :] - jnp.exp(
            (st - st_bot)[None, :] * M_inv[:, None] - st_bot[None, :] / mu0
        )
        tms_neg = base[None, :] - jnp.exp(
            (st_top - st)[None, :] * M_inv[:, None] - st_top[None, :] / mu0
        )

    tms_fac = jnp.concatenate([tms_pos, tms_neg], axis=0)   # (2N, Ntau)
    solution = mathscr_B.transpose(1, 0, 2) * tms_fac[:, :, None]

    if L > 1:
        # Cross-layer accumulation (reference :493-591).  The reference
        # (and r1-r3 here) forms cumulative decay products and divides
        # partial sums by them; at f32 the product exp(sum log_decay)
        # UNDERFLOWS to 0 for near-horizon streams (M_inv ~ 50 x layer
        # thickness), turning the division into 0/0 = NaN.  Instead
        # form the pairwise exponents CL_j - CL_l directly: every
        # exponent is <= 0 by construction (same argument as the BVP
        # exponential scaling, docs/derivation.md section 8.2), so the
        # terms underflow harmlessly to 0.  Costs an (N, L, L) tensor
        # per solve - negligible against the Fourier synthesis.
        mu0_inv = 1.0 / mu0
        front = tau_w0[:-1]
        back = tau_w0[1:]
        exp_front_mu0 = jnp.concatenate(
            [jnp.ones((1,), dtype), jnp.exp(-front[1:] * mu0_inv)]
        )                                                   # (L,)
        Bpos = mathscr_B_layers[:, :N, :]                   # (L, N, Nphi)
        Bneg = mathscr_B_layers[:, N:, :]

        log_decay = -scaled_thickness[None, :] * M_inv[:, None]   # (N, L)
        CL = jnp.concatenate(
            [jnp.zeros((N, 1), dtype), jnp.cumsum(log_decay, axis=1)],
            axis=1,
        )                                                   # (N, L+1)
        neg_cap = jnp.asarray(-88.0, dtype)                 # exp(-88) ~ f32 tiny
        if antiderivative:
            integration_factor = mu_pos[:, None] / sol.scale_tau[None, :]

        # POS: contributions from layers below
        # R_pos[k, l] = sum_{j >= l+1} term_j exp(CL_j - CL_{l+1})
        thick_pos = scaled_thickness[None, :] * (M_inv + mu0_inv)[:, None]
        em1_pos = -jnp.expm1(-thick_pos)
        if antiderivative:
            em1_pos = integration_factor * em1_pos
        layer_term_pos = em1_pos * exp_front_mu0[None, :]
        Epos = CL[:, None, :L] - CL[:, 1:, None]            # (N, l, j)
        jj = jnp.arange(L)
        mask_pos = (jj[None, :] >= jj[:, None] + 1)         # (l, j)
        Rpos = jnp.einsum(
            "klj,kj->kl",
            jnp.exp(jnp.where(mask_pos[None], Epos, neg_cap))
            * mask_pos[None].astype(dtype),
            layer_term_pos,
        )                                                   # (N, L)
        expfac_pos = jnp.exp(M_inv[:, None] * (st - back[l])[None, :])
        addition_pos = (Rpos[:, l] * expfac_pos)[:, :, None] * Bpos[l].transpose(1, 0, 2)

        # NEG: contributions from layers above
        # R_neg[k, l] = sum_{j <= l-1} term_j exp(CL_l - CL_{j+1})
        thick_neg = scaled_thickness[None, :] * (M_inv - mu0_inv)[:, None]
        nonneg = thick_neg >= 0
        exp_x1 = jnp.exp(-back * mu0_inv)[None, :]
        exp_x0 = jnp.exp(log_decay) * exp_front_mu0[None, :]
        em1_neg = jnp.expm1(-jnp.abs(thick_neg))
        layer_term_neg = jnp.where(nonneg, -em1_neg * exp_x1, em1_neg * exp_x0)
        if antiderivative:
            layer_term_neg = -integration_factor * layer_term_neg
        Eneg = CL[:, :L, None] - CL[:, None, 1:]            # (N, l, j)
        mask_neg = (jj[None, :] <= jj[:, None] - 1)
        Rneg = jnp.einsum(
            "klj,kj->kl",
            jnp.exp(jnp.where(mask_neg[None], Eneg, neg_cap))
            * mask_neg[None].astype(dtype),
            layer_term_neg,
        )
        expfac_neg = jnp.exp(M_inv[:, None] * (front[l] - st)[None, :])
        addition_neg = (Rneg[:, l] * expfac_neg)[:, :, None] * Bneg[l].transpose(1, 0, 2)

        solution = solution + jnp.concatenate([addition_pos, addition_neg], axis=0)

    # ---- IMS (reference pydisort.py:599-639) ----
    sum1 = jnp.sum(sol.omega_arr * sol.tau_arr)
    omega_avg = sum1 / jnp.sum(sol.tau_arr)
    sum2 = jnp.sum(sol.f_arr * sol.omega_arr * sol.tau_arr)
    f_avg = sum2 / sum1
    nleg_all = cfg.nleg_all
    two_ell_p1 = jnp.asarray(
        [2 * i + 1 for i in range(nleg_all)], dtype
    )
    leg_all = sol.weighted_leg_all / two_ell_p1[None, :]
    residue = jnp.concatenate(
        [
            jnp.broadcast_to(sol.f_arr[:, None], (L, cfg.nleg)),
            leg_all[:, cfg.nleg:],
        ],
        axis=1,
    )
    residue_avg = (
        jnp.sum(residue * (sol.omega_arr * sol.tau_arr)[:, None], axis=0) / sum2
    )
    scaled_mu0 = mu0 / (1.0 - omega_avg * f_avg)

    nu_neg = _nu(-mu_pos, phi, -mu0, phi0)                  # (N, Nphi)
    x = M_inv - 1.0 / scaled_mu0
    if antiderivative:
        chi = (
            (scaled_mu0 - x[:, None] * scaled_mu0 * (scaled_mu0 + tau)[None, :])
            * jnp.exp(-tau / scaled_mu0)[None, :]
            - mu_pos[:, None] * jnp.exp(-tau[None, :] * M_inv[:, None])
        ) / (mu_pos * scaled_mu0 * x**2)[:, None]
    else:
        chi = (
            (tau[None, :] - 1.0 / x[:, None]) * jnp.exp(-tau / scaled_mu0)[None, :]
            + jnp.exp(-tau[None, :] * M_inv[:, None]) / x[:, None]
        ) / (mu_pos * scaled_mu0 * x)[:, None]

    ims_phase = legendre_series(
        two_ell_p1 * (2.0 * residue_avg - residue_avg**2), nu_neg
    )                                                       # (N, Nphi)
    ims = (
        I0_div_4pi
        * (omega_avg * f_avg) ** 2
        / (1.0 - omega_avg * f_avg)
        * ims_phase
    )[:, None, :] * chi[:, :, None]                         # (N, Ntau, Nphi)

    return solution.at[N:].add(ims)


def make_corrected_u(sol: DisortSolution, problem=None):
    """Closure: NT-corrected intensity matching the reference's
    ``u_corrected`` (reference ``pydisort.py:643-698``)."""
    import numpy as np
    import jax

    from . import eval as ev

    tau_np = np.asarray(sol.tau_arr)
    tau_max = tau_np[-1]

    @jax.jit
    def _corrected(tau_j, phi_j):
        base = ev.u(sol, tau_j, phi_j, False, False)
        corr = nt_correction(sol, tau_j, phi_j, False)
        return base + sol.rescale_factor * corr

    @jax.jit
    def _corrected_anti(tau_j, phi_j):
        base = ev.u(sol, tau_j, phi_j, True, False)
        corr = nt_correction(sol, tau_j, phi_j, True)
        return base + sol.rescale_factor * corr

    @jax.jit
    def _corrected_ferr(tau_j, phi_j):
        base, ferr = ev.u(sol, tau_j, phi_j, False, True)
        corr = nt_correction(sol, tau_j, phi_j, False)
        return base + sol.rescale_factor * corr, ferr

    @jax.jit
    def _corrected_anti_ferr(tau_j, phi_j):
        base, ferr = ev.u(sol, tau_j, phi_j, True, True)
        corr = nt_correction(sol, tau_j, phi_j, True)
        return base + sol.rescale_factor * corr, ferr

    def u_corrected(tau, phi, is_antiderivative_wrt_tau=False,
                    return_Fourier_error=False, return_tau_arr=False):
        tau = np.atleast_1d(tau)
        phi = np.atleast_1d(phi)
        if np.any(tau < 0) or np.any(tau > tau_max):
            raise ValueError(
                "tau input outside the tau range specified for the atmosphere (check `tau_arr`)."
            )
        tau_j = jnp.asarray(tau)
        phi_j = jnp.asarray(phi)
        if return_Fourier_error:
            fn = _corrected_anti_ferr if is_antiderivative_wrt_tau else _corrected_ferr
            out, ferr = fn(tau_j, phi_j)
            outputs = (np.squeeze(np.asarray(out))[()], float(ferr))
        elif is_antiderivative_wrt_tau:
            outputs = (np.squeeze(np.asarray(_corrected_anti(tau_j, phi_j)))[()],)
        else:
            outputs = (np.squeeze(np.asarray(_corrected(tau_j, phi_j)))[()],)
        if return_tau_arr:
            outputs += (tau_np,)
        return outputs[0] if len(outputs) == 1 else outputs

    return u_corrected
