"""Core discrete-ordinates solve: problem -> spectral solution pytree.

This is the TPU-native redesign of the reference solve pipeline
(reference ``pydisort.py`` setup + ``_solve_for_gen_and_part_sols.py`` +
``_solve_for_coeffs.py``).  Architectural differences:

- The reference's two serial hot loops (Fourier modes x layers,
  ``_solve_for_gen_and_part_sols.py:91,114`` and
  ``_solve_for_coeffs.py:111``) are leading batch axes of fused tensor
  ops here: one associated-Legendre recurrence for all modes, one
  batched ``eigh`` for all (mode, layer) pairs, one batched
  block-tridiagonal solve for all modes.
- The nonsymmetric ``np.linalg.eig`` becomes the symmetrized
  Cholesky+eigh path (`ops/eig.py`), which runs on TPU.
- The reference's no-scattering shortcut and its dense-vs-banded solver
  switch disappear: the general paths handle those cases with no
  branching, keeping the program static-shaped for XLA.
- Everything here is jit-compatible and vmap-able over a leading batch
  axis of the problem pytree (columns x spectral bands).

Feature combinations (beam / isotropic source / BDRF / delta-M) are
static in ``DisortConfig``; each combination traces to a specialized
XLA program.
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from ...ops.eig import disort_eigh
from ...ops.blocktri import solve_block_tridiag
from ...ops.legendre import normalized_assoc_legendre
from ...ops.quadrature import double_gauss
from .types import DisortConfig, DisortProblem, DisortSolution


def affine_transform_poly_coeffs(poly_coeffs, a_arr, b_arr):
    """Coefficients of ``p((y-b)/a)`` given those of ``p(x)``, batched.

    ``poly_coeffs`` is (..., L, Nc), ascending order; returns the same
    shape such that ``sum_i D_i y^i = sum_i C_i x^i`` under
    ``y = a x + b`` (``a_arr``/``b_arr``: (..., L)).
    Capability parity: reference ``subroutines.py:574-610``.
    """
    nc = poly_coeffs.shape[-1]
    ii, jj = np.meshgrid(np.arange(nc), np.arange(nc), indexing="ij")
    # binomial C(j, i) for j >= i (upper Pascal), exponents j - i
    binom = np.where(
        jj >= ii,
        np.round(
            np.exp(
                _lgamma(jj + 1) - _lgamma(ii + 1) - _lgamma(jj - ii + 1)
            )
        ),
        0.0,
    )
    shift_pow = np.where(jj >= ii, jj - ii, 0)
    binom = jnp.asarray(binom, dtype=poly_coeffs.dtype)
    jpow = jnp.asarray(np.arange(nc), dtype=poly_coeffs.dtype)

    inv_a = (1.0 / a_arr)[..., None, None] ** jpow      # a > 0 always
    # Integer powers of (-b) via a cumprod ladder, NOT float `**`: XLA
    # pow is exp(p log x), which is NaN for the NEGATIVE shifts that
    # arise whenever scale_tau varies between layers (nonuniform omega
    # or f under delta-M) — a case no uniform-omega golden exercises.
    neg_b = -b_arr
    ladder = jnp.concatenate(
        [
            jnp.ones_like(neg_b)[..., None],
            jnp.cumprod(
                jnp.broadcast_to(neg_b[..., None], neg_b.shape + (nc - 1,)),
                axis=-1,
            ),
        ],
        axis=-1,
    )                                                   # (..., L, nc)
    shifts = jnp.take(ladder, jnp.asarray(shift_pow), axis=-1)
    T = binom * inv_a * shifts
    return jnp.einsum("...lij,...lj->...li", T, poly_coeffs)


def _lgamma(x):
    from scipy.special import gammaln

    return gammaln(x)


def iso_particular_tensor(G0, K0, G_inv_mu_inv, s_poly_desc):
    """The isotropic-source particular-solution tensor ``mathscr_b``.

    The particular solution for a per-layer polynomial source is itself
    polynomial in tau: ``v_l(tau)[q] = sum_i b[l, q, i] tau^(n-i)``
    (descending powers).  This computes ``b`` (L, 2N, Ns) once; both the
    boundary-value RHS and the evaluation functions reuse it.
    Capability parity: reference ``subroutines.py:746-862`` (general
    ``Nscoeffs`` path; the reference's 1- and 2-coefficient special
    cases are subsumed).

    Parameters
    ----------
    G0, K0 : (L, 2N, 2N), (L, 2N) mode-0 eigendata.
    G_inv_mu_inv : (L, 2N) ``G^-1 @ [1/mu, -1/mu]``.
    s_poly_desc : (L, Ns) source polynomial, DESCENDING order.
    """
    ns = s_poly_desc.shape[-1]
    n = ns - 1
    K_inv = 1.0 / K0                                   # (L, 2N)
    # K_invP[l, k, p] = K_inv^(p+1)
    K_invP = jnp.cumprod(
        jnp.broadcast_to(K_inv[:, :, None], K_inv.shape + (ns,)), axis=-1
    )

    fact = np.ones(ns)
    if ns > 1:
        fact[1:] = np.cumprod(np.arange(1, ns))
    fact_rev = jnp.asarray(fact[::-1].copy(), dtype=s_poly_desc.dtype)

    # weighted_a[l, i] = s_desc[l, i] * (n - i)!
    weighted_a = s_poly_desc * fact_rev[None, :]
    ii = np.arange(ns)[:, None]
    pp = np.arange(ns)[None, :]
    take_idx = jnp.asarray(np.where(ii - pp >= 0, ii - pp, 0))
    mask = jnp.asarray((ii - pp >= 0).astype(s_poly_desc.dtype))
    lower_tri = jnp.take(weighted_a, take_idx.reshape(-1), axis=1).reshape(
        weighted_a.shape[0], ns, ns
    ) * mask[None, :, :]                               # (L, i, p)

    ub = jnp.einsum("lkp,lip->lki", K_invP, lower_tri)  # (L, 2N, i)
    b_sigma = ub / fact_rev[None, None, :]
    b_right = b_sigma * G_inv_mu_inv[:, :, None]
    return jnp.einsum("lqk,lki->lqi", G0, b_right)      # (L, 2N, Ns)


def iso_poly_eval(b_rows, tau, scale_tau_l=None, antiderivative=False):
    """Evaluate ``v(tau)[..., q] = sum_i b[..., q, i] tau^(n-i)``.

    ``b_rows``: (..., R, Ns) rows of ``mathscr_b`` already gathered per
    tau point; ``tau``: (...,).  With ``antiderivative``, evaluates the
    tau-antiderivative ``sum_i b_i tau^(n-i+1) / ((n-i+1) scale_tau)``.
    """
    ns = b_rows.shape[-1]
    n = ns - 1
    # Power ladder tau^n..tau^1, 1 via cumprod, NOT jnp.power: TPU's
    # emulated-f64 pow computes exp(p*log(tau)) so pow(0, 0) -> NaN,
    # which poisons the boundary-value RHS whenever the top boundary
    # (tau = 0) is evaluated with an isotropic source present.
    ones = jnp.ones_like(tau)[..., None]
    if n > 0:
        tp = jnp.cumprod(
            jnp.broadcast_to(tau[..., None], tau.shape + (n,)), axis=-1
        )                                                # tau^1 .. tau^n
        tau_poly = jnp.concatenate([tp[..., ::-1], ones], axis=-1)
    else:
        tau_poly = ones
    if antiderivative:
        p = jnp.asarray(np.arange(n + 1, 0, -1), dtype=b_rows.dtype)
        tau_poly = tau_poly * tau[..., None] / (p * scale_tau_l[..., None])
    return jnp.einsum("...qi,...i->...q", b_rows, tau_poly)


def solve(problem: DisortProblem) -> DisortSolution:
    """Solve the 1D RTE for one atmosphere; returns the spectral solution.

    Pure, jittable, vmappable.  Mirrors the capabilities of reference
    ``pydisort.py:13-725`` (minus host-side validation, which lives in
    the API wrapper).
    """
    cfg = problem.config
    N, NF, L = cfg.n, cfg.nfourier, cfg.nlayers
    NLeg, NB, Ns = cfg.nleg, cfg.nbdrf, cfg.nscoeffs

    tau_arr = problem.tau_arr
    dtype = tau_arr.dtype
    omega_arr = problem.omega_arr
    f_arr = problem.f_arr
    mu0, I0, phi0 = problem.mu0, problem.I0, problem.phi0

    mu_np, w_np = double_gauss(cfg.nquad)
    mu = jnp.asarray(mu_np, dtype)
    w = jnp.asarray(w_np, dtype)
    M_inv = 1.0 / mu

    thickness = jnp.diff(tau_arr, prepend=jnp.zeros((1,), dtype))

    ell = np.arange(cfg.nleg_all)
    two_ell_p1 = jnp.asarray(2 * ell + 1, dtype)
    weighted_leg_all = two_ell_p1[None, :] * problem.leg_coeffs_all
    leg = problem.leg_coeffs_all[:, :NLeg]

    # ---- delta-M scaling (reference pydisort.py:313-344) ----
    if cfg.has_deltam:
        scale_tau = 1.0 - omega_arr * f_arr
        scaled_thickness = scale_tau * thickness
        scaled_tau_with_0 = jnp.concatenate(
            [jnp.zeros((1,), dtype), jnp.cumsum(scaled_thickness)]
        )
        scaled_leg = (leg - f_arr[:, None]) / (1.0 - f_arr)[:, None]
        scaled_omega = (1.0 - f_arr) / scale_tau * omega_arr
    else:
        scale_tau = jnp.ones((L,), dtype)
        scaled_tau_with_0 = jnp.concatenate([jnp.zeros((1,), dtype), tau_arr])
        scaled_leg = leg
        scaled_omega = omega_arr
    weighted_scaled_leg = scaled_leg * jnp.asarray(2 * ell[:NLeg] + 1, dtype)[None, :]

    if cfg.has_iso:
        if cfg.has_deltam:
            tau_tops = jnp.concatenate([jnp.zeros((1,), dtype), tau_arr[:-1]])
            translations = scaled_tau_with_0[:-1] - scale_tau * tau_tops
            scaled_s_poly = (
                affine_transform_poly_coeffs(
                    problem.s_poly_coeffs, scale_tau, translations
                )
                / scale_tau[:, None]
            ) * (1.0 - omega_arr)[:, None]
        else:
            scaled_s_poly = problem.s_poly_coeffs * (1.0 - omega_arr)[:, None]
    else:
        scaled_s_poly = jnp.zeros((L, 1), dtype)

    # ---- source rescaling for conditioning (reference pydisort.py:348-373) ----
    b_pos, b_neg = problem.b_pos, problem.b_neg
    candidates = [I0, jnp.max(b_pos), jnp.max(b_neg)]
    if cfg.has_iso:
        taup = scaled_tau_with_0[-1] ** jnp.asarray(np.arange(Ns), dtype)
        candidates += [scaled_s_poly[0, 0], scaled_s_poly[-1, :] @ taup]
    rescale = jnp.asarray(candidates).max()
    rescale = jnp.where(rescale > 0, rescale, jnp.ones((), dtype))
    I0 = I0 / rescale
    b_pos = b_pos / rescale
    b_neg = b_neg / rescale
    scaled_s_poly = scaled_s_poly / rescale
    I0_div_4pi = I0 / (4.0 * math.pi)

    # ---- phase-function kernels for all modes at once ----
    nodes = jnp.concatenate([mu, -mu0[None]]) if cfg.has_beam else mu
    lam = normalized_assoc_legendre(NF, NLeg, nodes)   # (NF, NLeg, N[+1])
    lam_mu = lam[:, :, :N]
    ms = np.arange(NF)[:, None]
    lseq = np.arange(NLeg)[None, :]
    mode_mask = jnp.asarray((lseq >= ms).astype(np.float64), dtype)
    parity = jnp.asarray(
        np.where(lseq >= ms, (-1.0) ** (lseq - ms), 0.0), dtype
    )

    # coeff[m, l, c] = (omega_l/2)(2c+1) g_{l,c}, zero for c < m
    coeff = (
        (scaled_omega[:, None] / 2.0) * weighted_scaled_leg
    )[None, :, :] * mode_mask[:, None, :]               # (NF, L, NLeg)

    Dp = jnp.einsum("mlc,mci,mcj->mlij", coeff, lam_mu, lam_mu)
    Dm = jnp.einsum("mlc,mci,mcj->mlij", coeff * parity[:, None, :], lam_mu, lam_mu)

    # ---- batched symmetric eigendecomposition (ops/eig.py) ----
    K_pos, X, Y, P, Q = disort_eigh(Dp, Dm, mu, w)      # (NF, L, ...)
    a_blk = 0.5 * (X + Y)
    b_blk = 0.5 * (X - Y)
    G = jnp.concatenate(
        [
            jnp.concatenate([a_blk, b_blk], axis=-1),
            jnp.concatenate([b_blk, a_blk], axis=-1),
        ],
        axis=-2,
    )                                                    # (NF, L, 2N, 2N)
    K_full = jnp.concatenate([-K_pos, K_pos], axis=-1)   # (NF, L, 2N)

    # ---- beam particular solution (reference _solve...py:209-231) ----
    if cfg.has_beam:
        lam_m0 = lam[:, :, N]                            # (NF, NLeg) at -mu0
        xfac = 2.0 * coeff * (
            jnp.asarray(
                np.where(np.arange(NF) == 0, 1.0, 2.0), dtype
            )[:, None, None]
            * I0_div_4pi
        ) * lam_m0[:, None, :]                           # (NF, L, NLeg)
        Xp = jnp.einsum("mlc,mci->mli", xfac, lam_mu)
        Xn = jnp.einsum("mlc,mci->mli", xfac * parity[:, None, :], lam_mu)
        X_arr = jnp.concatenate([M_inv * Xp, -M_inv * Xn], axis=-1)

        # G^-1 X via the P/Q blocks, then scale by 1/(1/mu0 + K), then G @
        xp, xn = X_arr[..., :N], X_arr[..., N:]
        Pp = jnp.einsum("mlij,mlj->mli", P, xp)
        Pn = jnp.einsum("mlij,mlj->mli", P, xn)
        Qp = jnp.einsum("mlij,mlj->mli", Q, xp)
        Qn = jnp.einsum("mlij,mlj->mli", Q, xn)
        y_top = 0.5 * (Pp + Qp + Pn - Qn)
        y_bot = 0.5 * (Pp - Qp + Pn + Qn)
        ycat = jnp.concatenate([y_top, y_bot], axis=-1) / (1.0 / mu0 + K_full)
        zt, zb = ycat[..., :N], ycat[..., N:]
        B_top = jnp.einsum("mlij,mlj->mli", a_blk, zt) + jnp.einsum(
            "mlij,mlj->mli", b_blk, zb
        )
        B_bot = jnp.einsum("mlij,mlj->mli", b_blk, zt) + jnp.einsum(
            "mlij,mlj->mli", a_blk, zb
        )
        B = jnp.concatenate([B_top, B_bot], axis=-1)     # (NF, L, 2N)
    else:
        B = jnp.zeros((NF, L, 2 * N), dtype)

    # ---- isotropic-source particular tensor (mode 0) ----
    if cfg.has_iso:
        QM = jnp.einsum("lij,j->li", Q[0], M_inv)        # (L, N)
        G_inv_mu_inv = jnp.concatenate([QM, -QM], axis=-1)
        s_desc = scaled_s_poly[:, ::-1]
        mathscr_b = iso_particular_tensor(G[0], K_full[0], G_inv_mu_inv, s_desc)
    else:
        mathscr_b = jnp.zeros((L, 2 * N, 1), dtype)

    # ---- BDRF operators, padded over modes (reference _solve_for_coeffs.py:118-135) ----
    mu_w = mu * w
    R = jnp.zeros((NF, N, N), dtype)
    X_bdrf = jnp.zeros((NF, N), dtype)
    if NB > 0:
        nb = min(NB, NF)
        delta = jnp.asarray(
            np.where(np.arange(nb) == 0, 2.0, 1.0), dtype
        )[:, None, None]
        R = R.at[:nb].set(delta * problem.bdrf_modes[:nb] * mu_w[None, None, :])
        if cfg.has_beam:
            X_bdrf = X_bdrf.at[:nb].set(
                (4.0 * mu0 * I0_div_4pi) * problem.bdrf_modes_mu0[:nb]
            )

    # ---- boundary-value problem: block-tridiagonal assembly & solve ----
    decay = jnp.exp(-K_pos * (scaled_tau_with_0[1:] - scaled_tau_with_0[:-1])[None, :, None])
    # layer basis evaluated at its bottom (Mtop) and top (Mbot) interfaces
    Mtop = jnp.concatenate(
        [G[..., :N] * decay[..., None, :], G[..., N:]], axis=-1
    )
    Mbot = jnp.concatenate(
        [G[..., :N], G[..., N:] * decay[..., None, :]], axis=-1
    )

    # Bottom BC rows: (G_pn - R G_nn) decay | (G_pp - R G_np)
    GL = G[:, -1]
    bot_left = (
        GL[:, :N, :N] - jnp.einsum("mij,mjk->mik", R, GL[:, N:, :N])
    ) * decay[:, -1, None, :]
    bot_right = GL[:, :N, N:] - jnp.einsum("mij,mjk->mik", R, GL[:, N:, N:])
    Bt = jnp.concatenate([bot_left, bot_right], axis=-1)  # (NF, N, 2N)

    if L == 1:
        Dg = jnp.concatenate([Mbot[:, 0, N:, :], Bt], axis=1)[:, None]
        lower = jnp.zeros_like(Dg)
        upper = jnp.zeros_like(Dg)
    else:
        d_top = jnp.concatenate(
            [Mbot[:, 0:1, N:, :], -Mbot[:, 1:, N:, :]], axis=1
        )
        d_bot = jnp.concatenate(
            [Mtop[:, : L - 1, :N, :], Bt[:, None]], axis=1
        )
        Dg = jnp.concatenate([d_top, d_bot], axis=2)      # (NF, L, 2N, 2N)
        zN = jnp.zeros((NF, 1, N, 2 * N), dtype)
        lower = jnp.concatenate(
            [jnp.concatenate([zN, Mtop[:, : L - 1, N:, :]], axis=1),
             jnp.zeros((NF, L, N, 2 * N), dtype)],
            axis=2,
        )
        upper = jnp.concatenate(
            [jnp.zeros((NF, L, N, 2 * N), dtype),
             jnp.concatenate([-Mbot[:, 1:, :N, :], zN], axis=1)],
            axis=2,
        )

    # RHS (reference _solve_for_coeffs.py:139-256)
    rhs_top = jnp.broadcast_to(b_neg.T, (NF, N)).astype(dtype)
    rhs_bot = jnp.broadcast_to(b_pos.T, (NF, N)).astype(dtype)
    if cfg.has_beam:
        beam_decay_bot = jnp.exp(-scaled_tau_with_0[-1] / mu0)
        rhs_top = rhs_top - B[:, 0, N:]
        rhs_bot = rhs_bot + (
            X_bdrf
            + jnp.einsum("mij,mj->mi", R, B[:, -1, N:])
            - B[:, -1, :N]
        ) * beam_decay_bot

    if cfg.has_iso:
        v_top = iso_poly_eval(mathscr_b[0], jnp.zeros((), dtype))      # (2N,)
        v_bot = iso_poly_eval(mathscr_b[-1], scaled_tau_with_0[-1])    # (2N,)
        rhs_top = rhs_top.at[0].add(-v_top[N:])
        rhs_bot = rhs_bot.at[0].add(
            -v_bot[:N] + jnp.einsum("ij,j->i", R[0], v_bot[N:])
        )

    if L > 1:
        cont_rhs = jnp.zeros((NF, L - 1, 2 * N), dtype)
        if cfg.has_beam:
            bdecay = jnp.exp(-scaled_tau_with_0[1:-1] / mu0)
            cont_rhs = cont_rhs + (B[:, 1:, :] - B[:, :-1, :]) * bdecay[None, :, None]
        if cfg.has_iso:
            tb = scaled_tau_with_0[1:-1]                               # (L-1,)
            v_below = iso_poly_eval(mathscr_b[1:], tb)                 # (L-1, 2N)
            v_above = iso_poly_eval(mathscr_b[:-1], tb)
            cont_rhs = cont_rhs.at[0].add(v_below - v_above)
        rhs_chunk_top = jnp.concatenate(
            [rhs_top[:, None, :], cont_rhs[:, :, N:]], axis=1
        )
        rhs_chunk_bot = jnp.concatenate(
            [cont_rhs[:, :, :N], rhs_bot[:, None, :]], axis=1
        )
        rhs = jnp.concatenate([rhs_chunk_top, rhs_chunk_bot], axis=2)  # (NF, L, 2N)
    else:
        rhs = jnp.concatenate([rhs_top, rhs_bot], axis=1)[:, None]

    # scan over layers, batch over modes
    C = solve_block_tridiag(
        jnp.moveaxis(lower, 1, 0),
        jnp.moveaxis(Dg, 1, 0),
        jnp.moveaxis(upper, 1, 0),
        jnp.moveaxis(rhs, 1, 0),
    )
    C = jnp.moveaxis(C, 0, 1)                             # (NF, L, 2N)
    GC = G * C[:, :, None, :]

    # Flux tables: (mu W)-contracted mode-0 data so the flux evaluators
    # gather per-layer vectors instead of (2N, 2N) blocks (see eval.py).
    mu_w = mu * w
    fvec_up = jnp.einsum("i,lij->lj", mu_w, GC[0][:, :N, :])
    fvec_dn = jnp.einsum("i,lij->lj", mu_w, GC[0][:, N:, :])
    fb_up = jnp.einsum("i,li->l", mu_w, B[0][:, :N])
    fb_dn = jnp.einsum("i,li->l", mu_w, B[0][:, N:])
    fi_up = jnp.einsum("i,lik->lk", mu_w, mathscr_b[:, :N, :])
    fi_dn = jnp.einsum("i,lik->lk", mu_w, mathscr_b[:, N:, :])

    return DisortSolution(
        config=cfg,
        G=G,
        K=K_full,
        # GC stored layer-flattened (NF, L, 4N^2): the minor dim 4N^2
        # tiles without lane padding (a trailing (2N, 2N) = (32, 32)
        # pays 4x lanes), and the evaluators reshape AFTER their
        # per-tau layer gather, so only the small gathered slab ever
        # exists in matrix form (see eval.u / eval.u0).
        GC=GC.reshape(GC.shape[0], GC.shape[1], -1),
        B=B,
        mathscr_b=mathscr_b,
        tau_arr=tau_arr,
        scaled_tau_with_0=scaled_tau_with_0,
        scale_tau=scale_tau,
        mu_arr_pos=mu,
        W=w,
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
