"""Arbitrary-precision oracle for the single-layer beam-source
discrete-ordinates system.

Solves the SAME discrete problem the solver solves (double-Gauss
nodes/weights taken as f64 inputs) in mpmath 50-digit arithmetic:
full 2N x 2N ODE eigendecomposition, beam particular solution,
two-boundary BVP, fluxes.  Used to measure each implementation's true
f64 rounding error (golden files only bound error at 1e-3; this bounds
it at 1e-45)."""

import numpy as np
import mpmath as mp

mp.mp.dps = 50


def oracle_fluxes(tau0, omega, NQuad, leg, mu0, I0, tau_eval):
    """Single layer, beam source only, no delta-M/BDRF/iso sources."""
    from pythonic_disort_tpu.ops.quadrature import double_gauss

    N = NQuad // 2
    mu_np, w_np = double_gauss(NQuad)
    mu = [mp.mpf(float(x)) for x in mu_np]
    w = [mp.mpf(float(x)) for x in w_np]
    omega = mp.mpf(float(omega))
    mu0 = mp.mpf(float(mu0))
    I0 = mp.mpf(float(I0))
    tau0 = mp.mpf(float(tau0))

    NLeg = len(leg)
    # Legendre polynomials at quadrature nodes and -mu0 (mode m=0)
    def legendre_vals(x, nl):
        vals = [mp.mpf(1), x]
        for l in range(1, nl - 1):
            vals.append(((2 * l + 1) * x * vals[l] - l * vals[l - 1]) / (l + 1))
        return vals[:nl]

    P_mu = [legendre_vals(m, NLeg) for m in mu]          # (N, NLeg)
    P_negmu0 = legendre_vals(-mu0, NLeg)

    wleg = [mp.mpf(float(leg[c])) * (2 * c + 1) for c in range(NLeg)]

    # D+ / D- kernels (mode 0)
    Dp = mp.matrix(N, N)
    Dm = mp.matrix(N, N)
    for i in range(N):
        for j in range(N):
            sp = mp.mpf(0)
            sm = mp.mpf(0)
            for c in range(NLeg):
                t = wleg[c] * P_mu[i][c] * P_mu[j][c]
                sp += t
                sm += t * (-1) ** c
            Dp[i, j] = omega / 2 * sp
            Dm[i, j] = omega / 2 * sm

    # alpha = M^-1 (Dp W - I), beta = M^-1 Dm W
    alpha = mp.matrix(N, N)
    beta = mp.matrix(N, N)
    for i in range(N):
        for j in range(N):
            alpha[i, j] = (Dp[i, j] * w[j] - (1 if i == j else 0)) / mu[i]
            beta[i, j] = (Dm[i, j] * w[j]) / mu[i]

    # Full ODE system du/dtau = Af u + s exp(-tau/mu0):
    #   mu_i du+_i/dtau = u+_i - [DpW u+]_i - [DmW u-]_i - X+_i e
    #  -mu_i du-_i/dtau = u-_i - [DmW u+]_i - [DpW u-]_i - X-_i e
    Af = mp.matrix(2 * N, 2 * N)
    for i in range(N):
        for j in range(N):
            Af[i, j] = -alpha[i, j]
            Af[i, N + j] = -beta[i, j]
            Af[N + i, j] = beta[i, j]
            Af[N + i, N + j] = alpha[i, j]

    E, V = mp.eig(Af)
    order = sorted(range(2 * N), key=lambda j: E[j].real)
    K_full = [E[j].real for j in order]
    G = mp.matrix(2 * N, 2 * N)
    for jj, j in enumerate(order):
        for i in range(2 * N):
            G[i, jj] = V[i, j].real

    pi = mp.pi
    s = mp.matrix(2 * N, 1)
    for i in range(N):
        sp = mp.mpf(0)
        sm = mp.mpf(0)
        for c in range(NLeg):
            t = wleg[c] * P_mu[i][c] * P_negmu0[c]
            sp += t
            sm += t * (-1) ** c
        coefb = omega * I0 / (4 * pi)
        s[i] = -coefb * sp / mu[i]
        s[N + i] = coefb * sm / mu[i]

    # particular solution B e^{-tau/mu0}: (Af + I/mu0) B = -s
    M2 = mp.matrix(2 * N, 2 * N)
    for i in range(2 * N):
        for j in range(2 * N):
            M2[i, j] = Af[i, j] + (1 / mu0 if i == j else 0)
    B = mp.lu_solve(M2, -s)

    # BVP: u(0)_down = 0, u(tau0)_up = 0 (no BDRF, no boundary sources)
    # u(tau) = sum_j C_j G[:,j] exp(K_j (tau - ref_j)) + B exp(-tau/mu0)
    # scaled exponentials: for K<0 ref=0 (top), for K>0 ref=tau0 (bottom)
    LHS = mp.matrix(2 * N, 2 * N)
    RHS = mp.matrix(2 * N, 1)
    for j in range(2 * N):
        k = K_full[j]
        e_top = mp.e ** (k * (0 - (0 if k < 0 else tau0)))
        e_bot = mp.e ** (k * (tau0 - (0 if k < 0 else tau0)))
        for i in range(N):
            # down rows at top (indices N..2N of u) = 0
            LHS[i, j] = G[N + i, j] * e_top
            # up rows at bottom (indices 0..N) = 0
            LHS[N + i, j] = G[i, j] * e_bot
    for i in range(N):
        RHS[i] = -B[N + i]
        RHS[N + i] = -B[i] * mp.e ** (-tau0 / mu0)
    C = mp.lu_solve(LHS, RHS)

    out = []
    for te in tau_eval:
        te = mp.mpf(float(te))
        u = mp.matrix(2 * N, 1)
        for j in range(2 * N):
            k = K_full[j]
            e = mp.e ** (k * (te - (0 if k < 0 else tau0)))
            for i in range(2 * N):
                u[i] += C[j] * G[i, j] * e
        eb = mp.e ** (-te / mu0)
        for i in range(2 * N):
            u[i] += B[i] * eb
        fup = 2 * pi * mp.fsum(mu[i] * w[i] * u[i] for i in range(N))
        fdn = 2 * pi * mp.fsum(mu[i] * w[i] * u[N + i] for i in range(N))
        out.append((fup, fdn))
    return out
