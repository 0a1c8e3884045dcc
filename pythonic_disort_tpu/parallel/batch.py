"""Batched (columns x bands) solves: the framework's production path.

The reference solves one column at one band per call (SURVEY section
2.4); here a whole batch is one compiled program: `solve` vmaps over
the leading axis of a `DisortProblem` whose array leaves carry a batch
dimension, and the flux evaluators vmap over the resulting batched
`DisortSolution`.  Combined with `parallel.mesh`, the batch axis shards
over a TPU pod slice.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from ..models.disort import eval as ev
from ..models.disort.batch_solve import solve_batched
from ..models.disort.solve import solve
from ..models.disort.types import DisortConfig, DisortProblem

# Production batched solve: the explicit lanes-layout implementation
# (`batch_solve.solve_batched`) — the whole pipeline stays in the
# batch-in-lanes layout, and only_flux configs never materialize the
# padded G/GC tensors.  `solve_vmapped` (the vmap of the per-column
# solve) is kept as the independent cross-check implementation;
# tests/test_batch_solve.py asserts they agree over the feature matrix.
solve_batch = solve_batched
solve_vmapped = jax.vmap(solve)


def make_batched_problem(
    config: DisortConfig,
    tau_arr,            # (B, L)
    omega_arr,          # (B, L)
    leg_coeffs_all,     # (B, L, nleg_all)
    mu0,                # (B,)
    I0,                 # (B,)
    phi0=None,          # (B,) or None -> zeros
    f_arr=None,         # (B, L) or None -> zeros
    b_pos=None,         # (B, N, NF) or None -> zeros
    b_neg=None,
    s_poly_coeffs=None,  # (B, L, Ns) or None
    bdrf_modes=None,     # (B, NB, N, N) or None
    bdrf_modes_mu0=None,
    dtype=jnp.float32,
) -> DisortProblem:
    """Assemble a batched problem pytree (leading axis = batch).

    Gradients w.r.t. ``mu0``: when built from concrete values the beam
    Legendre basis ``lam_mu0`` is precomputed on the host and becomes a
    constant leaf, so ``grad`` w.r.t. ``problem.mu0`` omits the
    d lam(-mu0)/d mu0 term.  Build the problem inside the traced
    function (mu0 a tracer -> device recurrence) for full geometry
    gradients.
    """
    B, L = np.shape(tau_arr)
    N, NF = config.n, config.nfourier

    def _arr(x, shape):
        if x is None:
            return jnp.zeros((B,) + shape, dtype)
        return jnp.asarray(x, dtype)

    # Host-precomputed beam phase-function basis at -mu0 (a pure
    # function of the input geometry, like the pre-evaluated BDRF
    # modes): saves the on-device Legendre degree recurrence per chunk.
    # Only possible when mu0 is concrete; under a trace (problem built
    # inside jit/grad, e.g. a retrieval differentiating geometry) fall
    # back to the on-device recurrence (lam_mu0=None), which is also
    # the path that keeps d lam(-mu0)/d mu0 in the autodiff graph.
    if isinstance(mu0, jax.core.Tracer):
        lam_mu0 = None
    else:
        from ..ops.legendre import normalized_assoc_legendre_host

        lam_mu0 = jnp.asarray(
            np.transpose(
                normalized_assoc_legendre_host(
                    NF, config.nleg, -np.asarray(mu0, np.float64)
                ),
                (2, 0, 1),
            ),
            dtype,
        )                                               # (B, NF, NLeg)

    return DisortProblem(
        config=config,
        tau_arr=jnp.asarray(tau_arr, dtype),
        omega_arr=jnp.asarray(omega_arr, dtype),
        leg_coeffs_all=jnp.asarray(leg_coeffs_all, dtype),
        f_arr=_arr(f_arr, (L,)),
        mu0=_arr(mu0, ()),
        I0=_arr(I0, ()),
        phi0=_arr(phi0, ()),
        b_pos=_arr(b_pos, (N, NF)),
        b_neg=_arr(b_neg, (N, NF)),
        s_poly_coeffs=_arr(
            s_poly_coeffs, (L, max(config.nscoeffs, 1))
        ),
        bdrf_modes=_arr(bdrf_modes, (max(config.nbdrf, 1), N, N)),
        bdrf_modes_mu0=_arr(bdrf_modes_mu0, (max(config.nbdrf, 1), N)),
        lam_mu0=lam_mu0,
    )


def fluxes_at(sol, tau):
    """(flux_up, flux_down_diffuse, flux_down_direct) at per-batch taus.

    ``sol``: batched solution; ``tau``: (B, Ntau).  Uses the combined
    evaluator so the layer lookup / delta-M rescale / homogeneous
    exponentials are computed once for both hemispheres.
    """
    return jax.vmap(ev.fluxes_all, in_axes=(0, 0))(sol, tau)


def solve_fluxes(problem: DisortProblem, tau_eval):
    """One fused program: batched solve + flux evaluation.

    ``tau_eval``: (B, Ntau) probe depths (typically layer boundaries,
    for heating-rate calculations).  This is the flagship production
    entry point for pod-scale shortwave/longwave sweeps.
    """
    sol = solve_batch(problem)
    return fluxes_at(sol, tau_eval)


def u0_at(sol, tau):
    """Batched zeroth-mode intensity: (B, 2N, Ntau).

    ``sol``: batched solution; ``tau``: (B, Ntau).
    """
    return jax.vmap(ev.u0, in_axes=(0, 0))(sol, tau)


def u_at(sol, tau, phi):
    """Batched full intensity: (B, 2N, Ntau, Nphi).

    ``tau``: (B, Ntau); ``phi``: (B, Nphi).  Capability parity with the
    reference ``u`` closure (reference
    ``_assemble_intensity_and_fluxes.py:170-330``) at pod-sweep scale.
    """
    return jax.vmap(ev.u, in_axes=(0, 0, 0))(sol, tau, phi)


def u_corrected_at(sol, tau, phi):
    """Batched NT-corrected intensity: (B, 2N, Ntau, Nphi).

    The reference's primary intensity output under ``NT_cor=True`` IS
    the corrected ``u`` (reference ``pydisort.py:643-698`` replaces
    ``u`` with ``u_corrected`` in the return); this is its production
    counterpart: the single-column `nt_correction` (pure and jittable)
    vmapped over the batched solution, so pod-scale delta-M sweeps emit
    the same de-aliased intensity the reference returns by default.
    """
    from ..models.disort.nt import nt_correction

    def one(sol_i, tau_i, phi_i):
        base = ev.u(sol_i, tau_i, phi_i)
        corr = nt_correction(sol_i, tau_i, phi_i)
        return base + sol_i.rescale_factor * corr

    return jax.vmap(one, in_axes=(0, 0, 0))(sol, tau, phi)


def solve_intensity(problem: DisortProblem, tau_eval, phi_eval,
                    nt_correct=None, probes_per_layer=False):
    """One fused program: batched solve + full-intensity evaluation.

    Returns ``u``: (B, 2N, Ntau, Nphi).  The intensity counterpart of
    `solve_fluxes` for sweeps that need angular output (remote sensing,
    radiance assimilation) rather than fluxes.

    ``nt_correct`` (default: ``problem.config.nt_correct``) applies the
    Nakajima-Tanaka TMS/IMS corrections, matching the reference's
    default intensity output for delta-M problems (reference
    ``pydisort.py:375``: active when NT_cor and a beam and delta-M
    truncation are present).  It is a STATIC (Python bool) argument —
    it selects which program to trace; pass it as a concrete
    bool/None, never as a traced value (mark it static in any
    enclosing ``jax.jit``).

    ``probes_per_layer`` (STATIC bool): set True when ``tau_eval`` has
    exactly one probe per layer with probe ``t`` inside layer ``t``
    (the heating-rate / layer-boundary footprint, Ntau == L).  The
    Fourier modes are then contracted inside the lanes solve
    (`solve_batched(boundary_probe_tau=...)`): the padded per-column
    ``GC`` tensor and its relayout/gather pipeline disappear, which is
    both the intensity path's HBM chunk ceiling and ~17% of its device
    time (docs/performance.md).  Results match the general path to
    roundoff (asserted by ``tests/test_batch_solve.py``).
    """
    if nt_correct is None:
        nt_correct = problem.config.nt_correct
    if probes_per_layer:
        from ..models.disort.nt import nt_correction

        sol, um = solve_batch(problem, boundary_probe_tau=tau_eval)
        NF = problem.config.nfourier
        cos = jnp.cos(
            jnp.arange(NF, dtype=um.dtype)[None, :, None]
            * (sol.phi0[:, None, None] - phi_eval[:, None, :])
        )                                                # (S, NF, Nphi)
        u = jnp.einsum("smit,smp->sitp", um, cos)
        if nt_correct:
            u = u + jax.vmap(nt_correction)(sol, tau_eval, phi_eval)
        return sol.rescale_factor[:, None, None, None] * u
    sol = solve_batch(problem)
    if nt_correct:
        return u_corrected_at(sol, tau_eval, phi_eval)
    return u_at(sol, tau_eval, phi_eval)


def actinic_at(sol, tau):
    """Batched diffuse actinic fluxes ``(up, down)``, each (B, Ntau).

    Device-native counterpart of the reference's host-side closures
    (reference ``subroutines.py:258-318``): ``2 pi W @ u0`` per
    hemisphere, with the delta-M direct-beam reclassification folded
    into the downward component.
    """
    import math

    def one(sol_i, tau_i):
        u0v = ev.u0(sol_i, tau_i)                      # (2N, Ntau)
        N = sol_i.config.n
        W = sol_i.W
        up = 2.0 * math.pi * jnp.einsum("i,it->t", W, u0v[:N])
        dn = 2.0 * math.pi * jnp.einsum("i,it->t", W, u0v[N:])
        dn = dn + ev.act_dscale_reclassification(sol_i, tau_i)
        return up, dn

    return jax.vmap(one, in_axes=(0, 0))(sol, tau)


def solve_actinic(problem: DisortProblem, tau_eval):
    """One fused program: batched solve + actinic-flux evaluation."""
    sol = solve_batch(problem)
    return actinic_at(sol, tau_eval)


def solve_fluxes_sharded(problem: DisortProblem, tau_eval, mesh,
                         axis_name="batch"):
    """`solve_fluxes` with the batch axis explicitly sharded via
    ``jax.shard_map``: each device runs its batch shard's solve as a
    fully local program.

    ``axis_name`` may be one mesh axis (1-D batch) or a tuple of mesh
    axes, e.g. ``("columns", "bands")`` for a problem whose leaves
    carry two leading batch dimensions sharded over a 2-D mesh; the
    local program flattens its (columns, bands) shard into one batch.

    Why not plain ``jit`` + ``NamedSharding``?  The lanes-layout
    kernels (`ops/jacobi.py`, `ops/blocktri.py`) reshape the batch axis
    into a trailing lane dimension; GSPMD cannot propagate the batch
    sharding through those reshapes and falls back to replicating the
    whole computation on every device (measured ~0.45 weak-scaling
    efficiency at 2 devices).  ``shard_map`` pins the decomposition:
    the interior is collective-free (asserted by
    ``tests/test_parallel.py::test_sharded_production_program_is_collective_free``),
    so weak-scaling efficiency is limited only by load balance
    (measured ~1.0 on a core-pinned virtual CPU mesh).
    """
    from jax.sharding import PartitionSpec as P

    if isinstance(axis_name, str):
        spec = P(axis_name)
        local = solve_fluxes
    else:
        spec = P(*axis_name)
        nlead = len(axis_name)

        def local(p, t):
            lead = p.tau_arr.shape[:nlead]

            def flat(x):
                return x.reshape((-1,) + x.shape[nlead:])

            outs = solve_fluxes(jax.tree.map(flat, p), flat(t))
            return tuple(
                x.reshape(lead + x.shape[1:]) for x in outs
            )

    # check_vma=False: the varying-manual-axes analysis rejects scans
    # whose carry init is batch-invariant (e.g. the Legendre recurrence
    # identity rows); the interior is collective-free, so per-shard
    # execution is correct by construction.
    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec), out_specs=(spec, spec, spec),
        check_vma=False,
    )
    return fn(problem, tau_eval)


def solve_intensity_sharded(problem: DisortProblem, tau_eval, phi_eval,
                            mesh, axis_name="batch", nt_correct=None,
                            probes_per_layer=False):
    """`solve_intensity` with the batch axis sharded via
    ``jax.shard_map`` — the pod-scale counterpart of
    `solve_fluxes_sharded` for angular-output sweeps (remote sensing,
    radiance assimilation).  Same rationale and collective-free
    interior as the flux version (see its docstring); ``nt_correct``
    and ``probes_per_layer`` are static, as for `solve_intensity`.
    """
    from jax.sharding import PartitionSpec as P

    if isinstance(axis_name, str):
        spec = P(axis_name)

        def local(p, t, ph):
            return solve_intensity(p, t, ph, nt_correct=nt_correct,
                                   probes_per_layer=probes_per_layer)
    else:
        spec = P(*axis_name)
        nlead = len(axis_name)

        def local(p, t, ph):
            lead = p.tau_arr.shape[:nlead]

            def flat(x):
                return x.reshape((-1,) + x.shape[nlead:])

            u = solve_intensity(
                jax.tree.map(flat, p), flat(t), flat(ph),
                nt_correct=nt_correct, probes_per_layer=probes_per_layer,
            )
            return u.reshape(lead + u.shape[1:])

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return fn(problem, tau_eval, phi_eval)


def global_flux_stats(fup, axis_name=None):
    """Example cross-batch diagnostic; with ``axis_name`` reduces over a
    mesh axis via a collective (psum), otherwise over the local batch."""
    total = jnp.sum(fup)
    count = jnp.asarray(np.prod(fup.shape), fup.dtype)
    if axis_name is not None:
        total = jax.lax.psum(total, axis_name)
        count = jax.lax.psum(count, axis_name)
    return total / count
