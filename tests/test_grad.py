"""Autodiff hardening (replaces reference ``autograd_compatible``,
reference ``pydisort.py:88-90,177-180``).

The framework's differentiability story rests on custom JVP/VJP rules
for the lanes kernels (`ops/jacobi.py`, `ops/lanes.py`,
`ops/blocktri.py`).  Round 2 shipped one smoke test; this module
probes each rule against finite differences, including the regimes the
rules are weakest in:

- full pipeline gradients through delta-M + multi-layer + NFourier > 1;
- the near-conservative limit (omega -> 1) where the smallest
  eigenvalue K^2 -> 0 and eigenvalues can nearly coalesce, stressing
  the 1/(lambda_j - lambda_i) gap formula of the eigh JVP;
- the block-tridiagonal transpose-system VJP;
- the Cholesky pullback and triangular-solve VJPs.
"""

from math import pi

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import pythonic_disort_tpu as pdt
from pythonic_disort_tpu.models.disort import eval as ev
from pythonic_disort_tpu.models.disort.api import build_problem
from pythonic_disort_tpu.ops.blocktri import solve_block_tridiag
from pythonic_disort_tpu.ops.jacobi import jacobi_eigh
from pythonic_disort_tpu.ops.lanes import cholesky_lanes, triangular_solve_lanes


def _fd_grad(f, x, eps=1e-6):
    """Central finite-difference gradient of scalar f at 1-D x."""
    x = np.asarray(x, np.float64)
    g = np.zeros_like(x)
    for i in range(x.size):
        dx = np.zeros_like(x)
        dx[i] = eps
        g[i] = (float(f(jnp.asarray(x + dx))) - float(f(jnp.asarray(x - dx)))) / (2 * eps)
    return g


def _flux_loss_builder(omega_np, *, NFourier=None, only_flux=True, f_g=0.0):
    """Returns loss(omega_arr) -> scalar through the full pipeline."""
    L = len(omega_np)
    tau_np = np.cumsum(np.full(L, 0.7))
    nleg = 8
    leg = np.tile(0.75 ** np.arange(nleg + 1), (L, 1))

    def loss(omega):
        cfg, prob = build_problem(
            tau_arr=tau_np, omega_arr=omega_np, NQuad=8,
            Leg_coeffs_all=leg, mu0=0.6, I0=pi, phi0=0.4,
            NFourier=NFourier, only_flux=only_flux,
            f_arr=(leg[:, nleg] if f_g else 0),
        )
        prob.omega_arr = jnp.asarray(omega, prob.omega_arr.dtype)
        sol = pdt.solve(prob)
        taus = jnp.asarray([0.3, 1.1, tau_np[-1]])
        out = jnp.sum(ev.flux_up(sol, taus))
        dn, dr = ev.flux_down(sol, taus)
        out = out + jnp.sum(dn)
        if not only_flux:
            out = out + jnp.sum(
                ev.u(sol, taus, jnp.asarray([0.0, 2.0]))
            )
        return out

    return loss


def test_grad_deltam_multilayer_nfourier():
    """d(loss)/d(omega) through delta-M scaling, 3 layers, NFourier=8
    (full intensity synthesis) matches finite differences."""
    omega = np.array([0.55, 0.8, 0.35])
    loss = _flux_loss_builder(omega, NFourier=8, only_flux=False, f_g=1.0)
    g = np.asarray(jax.grad(loss)(jnp.asarray(omega)))
    fd = _fd_grad(loss, omega)
    np.testing.assert_allclose(g, fd, rtol=2e-4, atol=1e-9)


def test_grad_near_conservative():
    """omega = 1 - 1e-6: smallest K^2 -> 0.  The Jacobi JVP's gap
    formula must stay finite and accurate in the solver's proudest
    regime (the reference's LAPACK eig fails no such test)."""
    omega = np.array([1.0 - 1e-6])
    loss = _flux_loss_builder(omega, only_flux=True)
    g = np.asarray(jax.grad(loss)(jnp.asarray(omega)))
    assert np.all(np.isfinite(g))
    # FD step must stay inside (omega < 1); use a one-sided-safe eps
    fd = _fd_grad(loss, omega, eps=3e-7)
    np.testing.assert_allclose(g, fd, rtol=5e-4)


def test_jacobi_jvp_degenerate_eigenvalues():
    """Eigenvalue derivatives of a matrix with an (almost) repeated pair
    stay finite and match FD for a symmetric function of the spectrum
    (well-defined even under degeneracy)."""
    rng = np.random.default_rng(3)
    Qm, _ = np.linalg.qr(rng.standard_normal((6, 6)))
    lam = np.array([0.5, 1.0, 1.0 + 1e-9, 2.0, 3.0, 4.0])
    A0 = (Qm * lam) @ Qm.T
    S = rng.standard_normal((6, 6)) * 0.1

    def loss(t):
        A = jnp.asarray(A0) + t * jnp.asarray(S + S.T)
        w, _ = jacobi_eigh(A[None])
        return jnp.sum(w**2)

    g = float(jax.grad(loss)(jnp.asarray(0.0)))
    assert np.isfinite(g)
    eps = 1e-6
    fd = (float(loss(eps)) - float(loss(-eps))) / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def test_blocktri_vjp_matches_fd():
    """Reverse-mode through the block-tridiagonal solve (transposed
    block-Thomas system, `ops/blocktri.py:127-143`) vs FD in every
    operand."""
    rng = np.random.default_rng(7)
    L, n = 3, 4
    diag = rng.standard_normal((L, n, n)) * 0.2 + np.eye(n) * 3
    lower = rng.standard_normal((L, n, n)) * 0.2
    upper = rng.standard_normal((L, n, n)) * 0.2
    rhs = rng.standard_normal((L, n))
    wgt = rng.standard_normal((L, n))

    def loss_parts(lo, di, up, rh):
        x = solve_block_tridiag(lo, di, up, rh)
        return jnp.sum(jnp.asarray(wgt) * x)

    grads = jax.grad(loss_parts, argnums=(0, 1, 2, 3))(
        jnp.asarray(lower), jnp.asarray(diag), jnp.asarray(upper),
        jnp.asarray(rhs),
    )
    operands = [lower, diag, upper, rhs]
    for argi, (g, base) in enumerate(zip(grads, operands)):
        flat = base.reshape(-1)

        def loss_flat(v, argi=argi, base=base):
            ops = [jnp.asarray(o) for o in operands]
            ops[argi] = v.reshape(base.shape)
            return loss_parts(*ops)

        fd = _fd_grad(loss_flat, flat).reshape(base.shape)
        g = np.asarray(g)
        if argi == 0:
            # lower[0] is ignored by convention; its gradient is defined
            # to be whatever the solve does with it (zero contribution)
            fd[0] = g[0]
        if argi == 2:
            fd[-1] = g[-1]
        np.testing.assert_allclose(g, fd, rtol=5e-6, atol=1e-9)


def test_cholesky_pullback_matches_fd():
    """Cholesky VJP (`ops/lanes.py:75-84`) through a generic composition
    S -> chol(S S^T + 2I) -> scalar, vs FD."""
    rng = np.random.default_rng(11)
    S0 = rng.standard_normal((2, 5, 5)) * 0.4

    def loss(Sf):
        S = Sf.reshape(2, 5, 5)
        A = jnp.einsum("bij,bkj->bik", S, S) + 2 * jnp.eye(5)
        Lc = cholesky_lanes(A)
        return jnp.sum(jnp.sin(Lc))

    g = np.asarray(jax.grad(loss)(jnp.asarray(S0.reshape(-1))))
    fd = _fd_grad(loss, S0.reshape(-1))
    np.testing.assert_allclose(g, fd, rtol=1e-6, atol=1e-10)


@pytest.mark.parametrize("transpose", [False, True])
def test_triangular_solve_vjp_matches_fd(transpose):
    rng = np.random.default_rng(13)
    Lmat = np.tril(rng.standard_normal((4, 4))) + np.eye(4) * 2
    B0 = rng.standard_normal((4, 3))

    def loss(v):
        Lc = v[:16].reshape(4, 4) * np.tri(4) + jnp.eye(4) * 0.0
        B = v[16:].reshape(4, 3)
        X = triangular_solve_lanes(Lc[None], B[None], transpose)
        return jnp.sum(jnp.cos(X))

    v0 = np.concatenate([Lmat.reshape(-1), B0.reshape(-1)])
    g = np.asarray(jax.grad(loss)(jnp.asarray(v0)))
    fd = _fd_grad(loss, v0)
    # entries above the diagonal are masked out of the primal; their
    # analytic gradient is 0 while FD also sees 0 — compare everything
    np.testing.assert_allclose(g, fd, rtol=1e-6, atol=1e-10)


def test_grad_wrt_beam_geometry():
    """d(flux)/d(mu0): beam-geometry gradients flow through the
    particular solution, BVP RHS, and the direct-beam terms."""
    L = 2
    tau_np = np.array([0.5, 1.5])
    nleg = 8
    leg = np.tile(0.6 ** np.arange(nleg + 1), (L, 1))

    def loss(mu0):
        cfg, prob = build_problem(
            tau_arr=tau_np, omega_arr=np.array([0.7, 0.4]), NQuad=8,
            Leg_coeffs_all=leg, mu0=0.6, I0=pi, phi0=0.0, only_flux=True,
        )
        prob.mu0 = jnp.asarray(mu0, prob.mu0.dtype).reshape(())
        sol = pdt.solve(prob)
        dn, dr = ev.flux_down(sol, jnp.asarray([0.25, 1.2]))
        return jnp.sum(dn) + jnp.sum(dr)

    g = float(jax.grad(loss)(jnp.asarray(0.6)))
    fd = _fd_grad(lambda v: loss(v[0]), np.array([0.6]))[0]
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_grad_through_batched_nt_corrected_intensity():
    """d(NT-corrected u)/d(omega) through the full batched production
    path (`parallel.solve_intensity(..., nt_correct=True)`): the TMS/IMS
    corrections are pure jnp, so the gradient must flow through the
    truncated/true phase-function split, the pairwise log-space
    cross-layer accumulation, and the Fourier solution, and match
    finite differences."""
    from pythonic_disort_tpu import parallel

    B, L, nquad, nleg, nleg_all = 2, 3, 8, 8, 24
    rng = np.random.default_rng(3)
    tau = np.cumsum(rng.uniform(0.3, 1.0, (B, L)), axis=1)
    g = rng.uniform(0.6, 0.75, (B, L))
    leg = g[..., None] ** np.arange(nleg_all)[None, None, :]
    f_arr = leg[..., nleg]
    mu0 = rng.uniform(0.5, 1.0, B)
    config = pdt.DisortConfig(
        nquad=nquad, nleg=nleg, nleg_all=nleg_all, nfourier=nquad,
        nlayers=L, nscoeffs=0, nbdrf=0, has_beam=True, only_flux=False,
        has_deltam=True, nt_correct=True,
    )
    tau_eval = jnp.asarray(tau * 0.7)
    phi_eval = jnp.broadcast_to(jnp.asarray([0.4, 2.2]), (B, 2))
    omega0 = rng.uniform(0.6, 0.9, (B, L))

    def loss(omega):
        problem = parallel.make_batched_problem(
            config, tau, omega, leg, mu0, np.full(B, pi),
            f_arr=f_arr, dtype=jnp.float64,
        )
        u = parallel.solve_intensity(problem, tau_eval, phi_eval)
        return jnp.sum(u**2)

    grad = jax.jit(jax.grad(loss))(jnp.asarray(omega0))
    assert np.isfinite(np.asarray(grad)).all()
    eps = 1e-6
    for (i, l) in [(0, 0), (1, 2)]:
        op = omega0.copy(); op[i, l] += eps
        om = omega0.copy(); om[i, l] -= eps
        fd = (float(loss(jnp.asarray(op))) - float(loss(jnp.asarray(om)))) / (2 * eps)
        np.testing.assert_allclose(float(grad[i, l]), fd, rtol=2e-5)
