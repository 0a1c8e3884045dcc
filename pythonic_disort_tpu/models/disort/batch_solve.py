"""Batched discrete-ordinates solve, end-to-end in TPU lanes layout.

This is the production counterpart of `solve.py` for problem pytrees
whose leaves carry a leading batch axis (columns x spectral bands).
`solve.py` computes one column in the natural padded ``(..., n, n)``
layout; under ``jax.vmap`` every intermediate pays the TPU tile padding
(8x at n = 16, 4x at 2n = 32 — see docs/performance.md).  This module
instead keeps the ENTIRE pipeline in the batch-in-lanes layout
``(n, m, B)`` that the Pallas kernels already use internally:

- the phase-function kernels ``D+/D-`` are built directly in lanes via
  per-mode MXU matmuls over the Legendre contraction;
- the eigen stage runs through `ops.eig.disort_eigh_lanes` (fused
  Pallas kernel on TPU f32) with no layout round-trips at its boundary;
- the boundary-value blocks (the reference's banded-matrix assembly,
  reference ``_solve_for_coeffs.py:118-335``) are assembled as
  ``(L, 2N, 2N, NF*S)`` lanes tensors and fed straight into
  `ops.blocktri.solve_block_tridiag_lanes`;
- the flux quadrature contraction ``(mu W) @ GC`` is folded in lanes,
  so the flux evaluators read tiny per-layer tables instead of the
  (NF, L, 2N, 2N) ``GC`` tensor.

For ``only_flux`` configs the padded ``G``/``GC`` tensors are never
materialized at all (the corresponding `DisortSolution` fields are
``None``), which is what raises the HBM-bound chunk size of the
production sweep.  Mathematics and outputs are identical to
``vmap(solve)`` — asserted by ``tests/test_batch_solve.py`` over the
full feature matrix.

Lane ordering convention: the eigen-stage batch is ``q = (m, l, s)``
(mode-major, solve-fastest), so per-mode slices are contiguous and the
reshape to the blocktri layout ``(L, ..., NF*S)`` never crosses the
lane (last) dimension.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ...ops.eig import disort_eigh_lanes
from ...ops.blocktri import solve_block_tridiag_lanes
from ...ops.legendre import (
    normalized_assoc_legendre,
    normalized_assoc_legendre_host,
)
from ...ops.quadrature import double_gauss
from .types import DisortProblem, DisortSolution
from .solve import affine_transform_poly_coeffs, iso_poly_eval


def _mat_lanes(A, x):
    """(n, k, q), (k, q) -> (n, q)."""
    return jnp.einsum("ikq,kq->iq", A, x)


def solve_batched(problem: DisortProblem, boundary_probe_tau=None):
    """Solve a batch of atmospheres; all leaves carry a leading S axis.

    Returns a batched `DisortSolution` equal (up to roundoff) to
    ``jax.vmap(solve)(problem)``, computed without ever leaving the
    lanes layout on the hot path.  For ``config.only_flux`` the padded
    ``G``/``GC`` fields are ``None`` (the flux evaluators use the
    ``fvec_*``/``fb_*``/``fi_*`` tables instead).

    ``boundary_probe_tau`` ((S, L), optional): one intensity probe
    depth per layer, probe ``t`` lying inside layer ``t``.  When given,
    the per-probe Fourier intensity modes are contracted directly from
    the lanes tensors (the layer "gather" is the identity, so the
    padded ``GC`` (S, NF, L, 4N^2) relayout — the intensity-path HBM
    ceiling, see docs/performance.md — never happens; ``GC`` stays
    ``None``) and the return becomes ``(solution, um)`` with ``um``
    (S, NF, 2N, L): the PRE-rescale Fourier modes of u at the probes.
    This is the production intensity fast path (reference evaluates the
    same modes per probe via its banded ``GC`` gathers,
    ``_assemble_intensity_and_fluxes.py:170-330``).
    """
    cfg = problem.config
    N, NF, L = cfg.n, cfg.nfourier, cfg.nlayers
    NLeg, NB, Ns = cfg.nleg, cfg.nbdrf, cfg.nscoeffs

    tau_arr = problem.tau_arr                        # (S, L)
    dtype = tau_arr.dtype
    S = tau_arr.shape[0]
    omega_arr = problem.omega_arr
    f_arr = problem.f_arr
    mu0, I0, phi0 = problem.mu0, problem.I0, problem.phi0   # (S,)

    mu_np, w_np = double_gauss(cfg.nquad)
    mu = jnp.asarray(mu_np, dtype)
    w = jnp.asarray(w_np, dtype)
    M_inv = 1.0 / mu

    thickness = jnp.diff(tau_arr, prepend=jnp.zeros((S, 1), dtype), axis=-1)

    ell = np.arange(cfg.nleg_all)
    two_ell_p1 = jnp.asarray(2 * ell + 1, dtype)
    weighted_leg_all = two_ell_p1[None, None, :] * problem.leg_coeffs_all
    leg = problem.leg_coeffs_all[..., :NLeg]

    # ---- delta-M scaling (reference pydisort.py:313-344) ----
    if cfg.has_deltam:
        scale_tau = 1.0 - omega_arr * f_arr
        scaled_thickness = scale_tau * thickness
        scaled_tau_with_0 = jnp.concatenate(
            [jnp.zeros((S, 1), dtype), jnp.cumsum(scaled_thickness, axis=-1)],
            axis=-1,
        )
        scaled_leg = (leg - f_arr[..., None]) / (1.0 - f_arr)[..., None]
        scaled_omega = (1.0 - f_arr) / scale_tau * omega_arr
    else:
        scale_tau = jnp.ones((S, L), dtype)
        scaled_tau_with_0 = jnp.concatenate(
            [jnp.zeros((S, 1), dtype), tau_arr], axis=-1
        )
        scaled_leg = leg
        scaled_omega = omega_arr
    weighted_scaled_leg = scaled_leg * jnp.asarray(
        2 * ell[:NLeg] + 1, dtype
    )[None, None, :]

    if cfg.has_iso:
        if cfg.has_deltam:
            tau_tops = jnp.concatenate(
                [jnp.zeros((S, 1), dtype), tau_arr[:, :-1]], axis=-1
            )
            translations = scaled_tau_with_0[:, :-1] - scale_tau * tau_tops
            scaled_s_poly = (
                affine_transform_poly_coeffs(
                    problem.s_poly_coeffs, scale_tau, translations
                )
                / scale_tau[..., None]
            ) * (1.0 - omega_arr)[..., None]
        else:
            scaled_s_poly = problem.s_poly_coeffs * (1.0 - omega_arr)[..., None]
    else:
        scaled_s_poly = jnp.zeros((S, L, 1), dtype)

    # ---- source rescaling for conditioning (reference pydisort.py:348-373) ----
    b_pos, b_neg = problem.b_pos, problem.b_neg      # (S, N, NF)
    candidates = [I0, jnp.max(b_pos, axis=(1, 2)), jnp.max(b_neg, axis=(1, 2))]
    if cfg.has_iso:
        taup = scaled_tau_with_0[:, -1:] ** jnp.asarray(np.arange(Ns), dtype)
        candidates += [
            scaled_s_poly[:, 0, 0],
            jnp.einsum("si,si->s", scaled_s_poly[:, -1, :], taup),
        ]
    rescale = jnp.stack(candidates, axis=-1).max(axis=-1)       # (S,)
    rescale = jnp.where(rescale > 0, rescale, jnp.ones((), dtype))
    I0 = I0 / rescale
    b_pos = b_pos / rescale[:, None, None]
    b_neg = b_neg / rescale[:, None, None]
    scaled_s_poly = scaled_s_poly / rescale[:, None, None]
    I0_div_4pi = I0 / (4.0 * math.pi)

    # ---- phase-function kernels, built directly in lanes layout ----
    # lam over the quadrature nodes is shared by every solve AND known
    # at trace time: embed it as a program constant (the on-device
    # recurrence cost ~2.3 ms/chunk); lam at the per-solve -mu0 stays a
    # batched device evaluation.
    lam_mu = jnp.asarray(
        normalized_assoc_legendre_host(NF, NLeg, mu_np), dtype
    )                                                           # (NF, NLeg, N)
    ms = np.arange(NF)[:, None]
    lseq = np.arange(NLeg)[None, :]
    mode_mask = jnp.asarray((lseq >= ms).astype(np.float64), dtype)
    parity = jnp.asarray(
        np.where(lseq >= ms, (-1.0) ** (lseq - ms), 0.0), dtype
    )

    # base[s, l, c] = (omega_l/2)(2c+1) g_{l,c}; per-mode masked below
    base_c = (scaled_omega[..., None] / 2.0) * weighted_scaled_leg
    base_lanes = base_c.transpose(2, 1, 0).reshape(NLeg, L * S)  # (NLeg, L*S)

    LS = L * S
    Dp_parts, Dm_parts = [], []
    for m in range(NF):
        lamlam = (
            lam_mu[m][:, :, None] * lam_mu[m][:, None, :]
        ).reshape(NLeg, N * N)                                   # (NLeg, N*N)
        cm = mode_mask[m][:, None] * base_lanes                  # (NLeg, L*S)
        Dp_parts.append((lamlam.T @ cm).reshape(N, N, LS))
        Dm_parts.append(((lamlam * parity[m][:, None]).T @ cm).reshape(N, N, LS))
    Dp_l = jnp.stack(Dp_parts, axis=2).reshape(N, N, NF * LS)    # q = (m, l, s)
    Dm_l = jnp.stack(Dm_parts, axis=2).reshape(N, N, NF * LS)

    # ---- batched eigen stage, lanes in / lanes out ----
    K_pos, X, Y, P, Q = disort_eigh_lanes(Dp_l, Dm_l, mu, w)     # (N[,N], Q)
    a_blk = 0.5 * (X + Y)
    b_blk = 0.5 * (X - Y)
    G_l = jnp.concatenate(
        [
            jnp.concatenate([a_blk, b_blk], axis=1),
            jnp.concatenate([b_blk, a_blk], axis=1),
        ],
        axis=0,
    )                                                            # (2N, 2N, Q)
    K_full = jnp.concatenate([-K_pos, K_pos], axis=0)            # (2N, Q)

    def per_mode(x_sl):
        """(S, L) per-solve quantity -> (Q,) lanes (broadcast over modes)."""
        return jnp.broadcast_to(
            x_sl.T[None, :, :], (NF, L, S)
        ).reshape(NF * LS)

    # ---- beam particular solution (reference _solve...py:209-231) ----
    if cfg.has_beam:
        if problem.lam_mu0 is not None:
            # host-precomputed at problem build (make_batched_problem)
            lam_m0 = jnp.transpose(problem.lam_mu0, (1, 2, 0))   # (NF, NLeg, S)
        else:
            lam_m0 = normalized_assoc_legendre(NF, NLeg, -mu0)   # (NF, NLeg, S)
        delta_m0 = np.where(np.arange(NF) == 0, 1.0, 2.0)
        xf_parts_p, xf_parts_n = [], []
        for m in range(NF):
            # xfac[c, (l, s)] = 2 coeff delta_m I0/(4pi) lam(-mu0)
            fac = (2.0 * float(delta_m0[m])) * (
                mode_mask[m][:, None] * base_lanes
            ).reshape(NLeg, L, S) * (I0_div_4pi[None, None, :]
                                     * lam_m0[m][:, None, :])
            fac = fac.reshape(NLeg, LS)
            xf_parts_p.append(lam_mu[m].T @ fac)                 # (N, LS)
            xf_parts_n.append(lam_mu[m].T @ (parity[m][:, None] * fac))
        Xp = jnp.stack(xf_parts_p, axis=1).reshape(N, NF * LS)
        Xn = jnp.stack(xf_parts_n, axis=1).reshape(N, NF * LS)
        X_arr = jnp.concatenate(
            [M_inv[:, None] * Xp, -M_inv[:, None] * Xn], axis=0
        )                                                        # (2N, Q)

        xp, xn = X_arr[:N], X_arr[N:]
        Pp = _mat_lanes(P, xp)
        Pn = _mat_lanes(P, xn)
        Qp = _mat_lanes(Q, xp)
        Qn = _mat_lanes(Q, xn)
        y_top = 0.5 * (Pp + Qp + Pn - Qn)
        y_bot = 0.5 * (Pp - Qp + Pn + Qn)
        mu0_q = per_mode(jnp.broadcast_to(mu0[:, None], (S, L)))
        ycat = jnp.concatenate([y_top, y_bot], axis=0) / (1.0 / mu0_q + K_full)
        zt, zb = ycat[:N], ycat[N:]
        B_top = _mat_lanes(a_blk, zt) + _mat_lanes(b_blk, zb)
        B_bot = _mat_lanes(b_blk, zt) + _mat_lanes(a_blk, zb)
        B_l = jnp.concatenate([B_top, B_bot], axis=0)            # (2N, Q)
    else:
        B_l = jnp.zeros((2 * N, NF * LS), dtype)

    # ---- isotropic-source particular tensor (mode 0; lanes) ----
    if cfg.has_iso:
        QM = _mat_lanes(Q[..., :LS], jnp.broadcast_to(M_inv[:, None], (N, LS)))
        G_inv_mu_inv = jnp.concatenate([QM, -QM], axis=0)        # (2N, LS)
        s_desc = scaled_s_poly[..., ::-1]                        # (S, L, Ns)
        K0 = K_full[:, :LS]
        K_inv = 1.0 / K0
        K_invP = jnp.cumprod(
            jnp.broadcast_to(K_inv[:, None, :], (2 * N, Ns, LS)), axis=1
        )
        fact = np.ones(Ns)
        if Ns > 1:
            fact[1:] = np.cumprod(np.arange(1, Ns))
        fact_rev = jnp.asarray(fact[::-1].copy(), dtype)
        wa = (s_desc * fact_rev[None, None, :]).transpose(2, 1, 0).reshape(
            Ns, LS
        )                                                        # (Ns, LS)
        cols = [
            jnp.concatenate(
                [jnp.zeros((p, LS), dtype), wa[: Ns - p]], axis=0
            )
            for p in range(Ns)
        ]
        lower_tri = jnp.stack(cols, axis=1)                      # (i, p, LS)
        ub = jnp.einsum("kpq,ipq->kiq", K_invP, lower_tri)       # (2N, Ns, LS)
        b_sigma = ub / fact_rev[None, :, None]
        b_right = b_sigma * G_inv_mu_inv[:, None, :]
        mathscr_b_l = jnp.einsum("jkq,kiq->jiq", G_l[..., :LS], b_right)
        mathscr_b = mathscr_b_l.reshape(2 * N, Ns, L, S).transpose(3, 2, 0, 1)
    else:
        mathscr_b = jnp.zeros((S, L, 2 * N, 1), dtype)

    # ---- BDRF operators (reference _solve_for_coeffs.py:118-135) ----
    mu_w = mu * w
    NFS = NF * S
    R_pad = jnp.zeros((S, NF, N, N), dtype)
    X_bdrf = jnp.zeros((S, NF, N), dtype)
    if NB > 0:
        nb = min(NB, NF)
        delta = jnp.asarray(
            np.where(np.arange(nb) == 0, 2.0, 1.0), dtype
        )[None, :, None, None]
        R_pad = R_pad.at[:, :nb].set(
            delta * problem.bdrf_modes[:, :nb] * mu_w[None, None, None, :]
        )
        if cfg.has_beam:
            X_bdrf = X_bdrf.at[:, :nb].set(
                (4.0 * mu0 * I0_div_4pi)[:, None, None]
                * problem.bdrf_modes_mu0[:, :nb]
            )
    R_l = R_pad.transpose(2, 3, 1, 0).reshape(N, N, NFS)
    X_bdrf_l = X_bdrf.transpose(2, 1, 0).reshape(N, NFS)
    has_bdrf = NB > 0

    # ---- BVP assembly, L-major lanes (L, rows, cols, NF*S) ----
    Gt = jnp.moveaxis(G_l.reshape(2 * N, 2 * N, NF, L, S), 3, 0).reshape(
        L, 2 * N, 2 * N, NFS
    )
    sthick = scaled_tau_with_0[:, 1:] - scaled_tau_with_0[:, :-1]   # (S, L)
    decay_q = jnp.exp(-K_pos * per_mode(sthick)[None, :])        # (N, Q)
    decay_t = jnp.transpose(
        decay_q.reshape(N, NF, L, S), (2, 0, 1, 3)
    ).reshape(L, N, NFS)

    # Bottom BC rows: (G_pn - R G_nn) decay | (G_pp - R G_np)
    GL = Gt[-1]                                                  # (2N, 2N, NFS)
    if has_bdrf:
        bot_left = (
            GL[:N, :N] - jnp.einsum("ijq,jkq->ikq", R_l, GL[N:, :N])
        ) * decay_t[-1][None, :, :]
        bot_right = GL[:N, N:] - jnp.einsum("ijq,jkq->ikq", R_l, GL[N:, N:])
    else:
        bot_left = GL[:N, :N] * decay_t[-1][None, :, :]
        bot_right = GL[:N, N:]
    Bt_rows = jnp.concatenate([bot_left, bot_right], axis=1)     # (N, 2N, NFS)

    import os as _os
    from ...ops.blocktri import _use_pallas as _bt_use_pallas

    # Default-on (opt out: PYDISORT_TPU_FUSED_BVP=0): build the BVP blocks inside
    # the Pallas block-Thomas kernel from Gt/decay directly instead of
    # materializing lower/diag/upper (3 x (L, 2N, 2N, NFS)) in HBM.
    _fused_bvp = (
        _os.environ.get("PYDISORT_TPU_FUSED_BVP", "1") == "1"
        and _bt_use_pallas(2 * N, dtype)
    )
    if not _fused_bvp:
        from ...ops.blocktri import assemble_bvp_blocks

        lower_t, Dg_t, upper_t = assemble_bvp_blocks(Gt, decay_t, Bt_rows)

    # ---- RHS (reference _solve_for_coeffs.py:139-256); kept as
    # (rows, NF, S) until the final reshape so mode-0 corrections are
    # plain slice updates ----
    B5 = B_l.reshape(2 * N, NF, L, S)
    rhs_top = jnp.broadcast_to(
        jnp.transpose(b_neg, (1, 2, 0)), (N, NF, S)
    ).astype(dtype)
    rhs_bot = jnp.broadcast_to(
        jnp.transpose(b_pos, (1, 2, 0)), (N, NF, S)
    ).astype(dtype)
    if cfg.has_beam:
        beam_decay_bot = jnp.exp(-scaled_tau_with_0[:, -1] / mu0)    # (S,)
        rhs_top = rhs_top - B5[N:, :, 0, :]
        RB = (
            jnp.einsum("ijq,jq->iq", R_l, B5[N:, :, -1, :].reshape(N, NFS))
            .reshape(N, NF, S)
            if has_bdrf
            else jnp.zeros((N, NF, S), dtype)
        )
        rhs_bot = rhs_bot + (
            X_bdrf_l.reshape(N, NF, S) + RB - B5[:N, :, -1, :]
        ) * beam_decay_bot[None, None, :]

    if cfg.has_iso:
        v_top = iso_poly_eval(mathscr_b[:, 0], jnp.zeros((S,), dtype))   # (S, 2N)
        v_bot = iso_poly_eval(mathscr_b[:, -1], scaled_tau_with_0[:, -1])
        rhs_top = rhs_top.at[:, 0, :].add(-v_top[:, N:].T)
        rv = (
            jnp.einsum("sij,sj->si", R_pad[:, 0], v_bot[:, N:])
            if has_bdrf
            else jnp.zeros((S, N), dtype)
        )
        rhs_bot = rhs_bot.at[:, 0, :].add((-v_bot[:, :N] + rv).T)

    if L > 1:
        cont_rhs = jnp.zeros((L - 1, 2 * N, NF, S), dtype)
        if cfg.has_beam:
            bdecay = jnp.exp(-scaled_tau_with_0[:, 1:-1] / mu0[:, None])  # (S, L-1)
            diffB = jnp.transpose(
                B5[:, :, 1:, :] - B5[:, :, :-1, :], (2, 0, 1, 3)
            )                                                    # (L-1, 2N, NF, S)
            cont_rhs = cont_rhs + diffB * bdecay.T[:, None, None, :]
        if cfg.has_iso:
            tb = scaled_tau_with_0[:, 1:-1]                      # (S, L-1)
            v_below = iso_poly_eval(mathscr_b[:, 1:], tb)        # (S, L-1, 2N)
            v_above = iso_poly_eval(mathscr_b[:, :-1], tb)
            cont_rhs = cont_rhs.at[:, :, 0, :].add(
                jnp.transpose(v_below - v_above, (1, 2, 0))
            )
        rhs_t = jnp.concatenate(
            [
                jnp.concatenate([rhs_top[None], cont_rhs[:, N:]], axis=0),
                jnp.concatenate([cont_rhs[:, :N], rhs_bot[None]], axis=0),
            ],
            axis=1,
        ).reshape(L, 2 * N, NFS)
    else:
        rhs_t = jnp.concatenate([rhs_top, rhs_bot], axis=0)[None].reshape(
            1, 2 * N, NFS
        )

    if _fused_bvp:
        from ...ops.pallas_blocktri import solve_bvp_fused

        C_t = solve_bvp_fused(Gt, decay_t, Bt_rows, rhs_t)
    else:
        C_t = solve_block_tridiag_lanes(
            lower_t, Dg_t, upper_t, rhs_t
        )                                                        # (L, 2N, NFS)

    # ---- boundary-probe intensity modes, contracted in lanes ----
    # um[t, i, (m, s)] = sum_j G[t, i, j] C[t, j] exp(K_j dt) (+ beam,
    # iso): probe t lives in layer t, so the eval-time layer gather is
    # the identity and the contraction reads Gt/C_t in place.
    um_probe = None
    if boundary_probe_tau is not None:
        top_b = scaled_tau_with_0[:, :-1]                        # (S, L)
        bot_b = scaled_tau_with_0[:, 1:]
        st_b = bot_b - (tau_arr - boundary_probe_tau) * scale_tau
        Kr = K_full.reshape(2 * N, NF, L, S)
        # exponents <= 0 by the usual anchoring (K[:N] < 0 at the layer
        # top, K[N:] > 0 at the bottom; derivation.md sec 8.2)
        e_neg = Kr[:N] * (st_b - top_b).T[None, None, :, :]
        e_pos = Kr[N:] * (st_b - bot_b).T[None, None, :, :]
        expo_b = jnp.exp(jnp.concatenate([e_neg, e_pos], axis=0))
        expo_t = jnp.transpose(expo_b, (2, 0, 1, 3)).reshape(
            L, 2 * N, NFS
        )
        um_t = jnp.einsum("tijq,tjq->tiq", Gt, C_t * expo_t)
        um5 = um_t.reshape(L, 2 * N, NF, S)
        if cfg.has_beam:
            bexp = jnp.exp(-st_b / mu0[:, None]).T               # (L, S)
            um5 = um5 + jnp.transpose(B5, (2, 0, 1, 3)) * bexp[:, None, None, :]
        if cfg.has_iso:
            v_iso = iso_poly_eval(mathscr_b, st_b)               # (S, L, 2N)
            um5 = um5.at[:, :, 0, :].add(jnp.transpose(v_iso, (1, 2, 0)))
        um_probe = jnp.transpose(um5, (3, 2, 1, 0))              # (S, NF, 2N, L)

    # ---- flux tables: quadrature contraction folded in lanes ----
    # fvec[l, j] = sum_{i in hemi} (mu w)_i G[l, i, j] C[l, j]; the
    # evaluators gather these per tau instead of reading GC.
    C0 = C_t.reshape(L, 2 * N, NF, S)[:, :, 0, :]                # (L, 2N, S)
    G0t = Gt.reshape(L, 2 * N, 2 * N, NF, S)[..., 0, :]          # (L, 2N, 2N, S)
    fvec_up = jnp.transpose(
        jnp.einsum("i,lijs->ljs", mu_w, G0t[:, :N]) * C0, (2, 0, 1)
    )                                                            # (S, L, 2N)
    fvec_dn = jnp.transpose(
        jnp.einsum("i,lijs->ljs", mu_w, G0t[:, N:]) * C0, (2, 0, 1)
    )
    fb_up = jnp.einsum("i,ils->sl", mu_w, B5[:N, 0])             # (S, L)
    fb_dn = jnp.einsum("i,ils->sl", mu_w, B5[N:, 0])
    fi_up = jnp.einsum("i,slik->slk", mu_w, mathscr_b[:, :, :N])
    fi_dn = jnp.einsum("i,slik->slk", mu_w, mathscr_b[:, :, N:])

    # ---- finalize to the (batched) solution pytree ----
    K_out = jnp.transpose(K_full.reshape(2 * N, NF, L, S), (3, 1, 2, 0))
    B_out = jnp.transpose(B5, (3, 1, 2, 0))                      # (S, NF, L, 2N)
    if cfg.only_flux or boundary_probe_tau is not None:
        # boundary-probe mode: the intensity was already contracted in
        # lanes above; the padded GC relayout would be pure overhead.
        G_out = None
        GC_out = None
    else:
        # G is consumed by nothing downstream (the evaluators read GC,
        # B, K and the fvec tables) — never materialize it; GC is
        # stored layer-flattened (S, NF, L, 4N^2) so the minor dim
        # tiles without lane padding (a trailing (2N, 2N) = (32, 32)
        # pays 4x; at NFourier=16, L=64 that is the difference between
        # ~4 and ~34 MB per solve — the intensity-path chunk ceiling).
        G_out = None
        G5 = Gt.reshape(L, 2 * N, 2 * N, NF, S)
        GC5 = G5 * C_t.reshape(L, 1, 2 * N, NF, S)
        GC_out = jnp.transpose(GC5, (4, 3, 0, 1, 2)).reshape(
            S, NF, L, 4 * N * N
        )

    sol = DisortSolution(
        config=cfg,
        G=G_out,
        K=K_out,
        GC=GC_out,
        B=B_out,
        mathscr_b=mathscr_b,
        tau_arr=tau_arr,
        scaled_tau_with_0=scaled_tau_with_0,
        scale_tau=scale_tau,
        mu_arr_pos=jnp.broadcast_to(mu[None], (S, N)),
        W=jnp.broadcast_to(w[None], (S, N)),
        mu0=mu0,
        I0=I0,
        phi0=phi0,
        rescale_factor=rescale,
        omega_arr=omega_arr,
        f_arr=f_arr,
        scaled_omega_arr=scaled_omega,
        weighted_leg_all=weighted_leg_all,
        weighted_scaled_leg=weighted_scaled_leg,
        fvec_up=fvec_up,
        fvec_dn=fvec_dn,
        fb_up=fb_up,
        fb_dn=fb_dn,
        fi_up=fi_up,
        fi_dn=fi_dn,
    )
    if boundary_probe_tau is not None:
        return sol, um_probe
    return sol
