"""Problem / Solution pytrees for the discrete-ordinates solver.

The reference exposes one 18-kwarg entry point returning Python
closures (reference ``pydisort.py:13-29``).  The TPU-native core is a
pure function ``solve(problem) -> solution`` over explicit pytrees:

- ``DisortConfig`` holds every *shape- or branch-determining* quantity
  (stream/mode/layer counts, feature flags).  It is hashable and enters
  jit as a static argument, so each feature combination compiles to a
  specialized program with no runtime branching.
- ``DisortProblem`` holds the numeric inputs as arrays.  It is a pytree:
  ``jax.vmap``/``pjit`` over a leading columns/bands batch axis applies
  to every leaf, which is how the framework scales to pod-size sweeps.
- ``DisortSolution`` holds the precomputed spectral data (eigenpairs,
  particular solutions, boundary-value coefficients) that the pure
  evaluation functions (`eval.py`) consume.  It replaces the closure
  environment of the reference (``_assemble_intensity_and_fluxes.py``).

Shape conventions follow the reference's documented table
(``pydisort.py:130-175``): ``L`` layers, ``N = NQuad//2`` streams per
hemisphere, ``NF`` Fourier modes, ``Ns`` source-polynomial
coefficients, ``NB`` BDRF modes.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


@dataclasses.dataclass(frozen=True)
class DisortConfig:
    """Static solver configuration (hashable; jit-static)."""

    nquad: int            # total streams (even); N = nquad // 2
    nleg: int             # phase-function Legendre coefficients used
    nleg_all: int         # total provided Legendre coefficients
    nfourier: int         # Fourier modes solved
    nlayers: int
    nscoeffs: int         # isotropic-source polynomial coeffs (0 = none)
    nbdrf: int            # BDRF Fourier modes (0 = none)
    has_beam: bool        # I0 > 0
    only_flux: bool = False
    nt_correct: bool = False   # apply Nakajima-Tanaka intensity corrections
    has_deltam: bool = True    # any f_arr > 0 (delta-M scaling active)

    @property
    def n(self) -> int:
        return self.nquad // 2

    @property
    def has_iso(self) -> bool:
        return self.nscoeffs > 0


def _register(cls, data_fields, meta_fields):
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls


@dataclasses.dataclass
class DisortProblem:
    """Numeric inputs of one solve (a pytree; batchable on a leading axis).

    BDRF Fourier modes are represented *pre-evaluated* on the quadrature
    grid (the reference's callable list is sampled host-side at the API
    boundary, cf. ``subroutines.cache_BDRF_Fourier_modes``,
    reference ``subroutines.py:490-570``):
    ``bdrf_modes[m, i, j] = BDRF_m(mu_i, mu_j)`` and
    ``bdrf_modes_mu0[m, i] = BDRF_m(mu_i, mu0)``.
    """

    config: DisortConfig          # static
    tau_arr: Any                  # (L,) layer lower boundaries (cumulative)
    omega_arr: Any                # (L,)
    leg_coeffs_all: Any           # (L, nleg_all)
    f_arr: Any                    # (L,) delta-M truncation fractions
    mu0: Any                      # scalar
    I0: Any                       # scalar
    phi0: Any                     # scalar
    b_pos: Any                    # (N, NF) bottom Dirichlet BC by mode
    b_neg: Any                    # (N, NF) top Dirichlet BC by mode
    s_poly_coeffs: Any            # (L, max(Ns,1)) iso-source polynomials
    bdrf_modes: Any               # (NB, N, N)
    bdrf_modes_mu0: Any           # (NB, N)
    # Optional host-precomputed associated-Legendre table at -mu0,
    # (B, NF, NLeg) on the batched path (same spirit as the
    # pre-evaluated BDRF modes above): the beam phase-function basis is
    # a pure function of mu0, and the on-device degree recurrence costs
    # ~2.3 ms per 512-column chunk.  None -> computed on device.
    lam_mu0: Any = None


_register(
    DisortProblem,
    data_fields=[
        "tau_arr", "omega_arr", "leg_coeffs_all", "f_arr", "mu0", "I0",
        "phi0", "b_pos", "b_neg", "s_poly_coeffs", "bdrf_modes",
        "bdrf_modes_mu0", "lam_mu0",
    ],
    meta_fields=["config"],
)


@dataclasses.dataclass
class DisortSolution:
    """Precomputed spectral solution data (a pytree).

    The four evaluation functions in ``eval.py`` are pure functions of
    this object and the requested (tau, phi) probe points; together they
    reproduce the reference's returned closures.
    """

    config: DisortConfig          # static
    # Eigen/homogeneous data
    G: Any                        # (NF, L, 2N, 2N) eigenvector matrices
                                  # (None on the batched path: nothing
                                  # downstream consumes it)
    K: Any                        # (NF, L, 2N) eigenvalues (-K+ asc | +K+ asc)
    GC: Any                       # (NF, L, 4N^2) G * C (BVP-weighted),
                                  # layer-flattened so the minor dim
                                  # tiles without TPU lane padding; the
                                  # evaluators reshape after the per-tau
                                  # layer gather (None when only_flux)
    B: Any                        # (NF, L, 2N) beam particular soln (zeros if none)
    mathscr_b: Any                # (L, 2N, Ns) iso particular polynomial tensor
    # Geometry / scaling
    tau_arr: Any                  # (L,)
    scaled_tau_with_0: Any        # (L+1,)
    scale_tau: Any                # (L,)
    mu_arr_pos: Any               # (N,)
    W: Any                        # (N,)
    mu0: Any
    I0: Any                       # rescaled beam intensity
    phi0: Any
    rescale_factor: Any
    # NT-correction inputs (kept regardless; tiny)
    omega_arr: Any                # (L,) unscaled
    f_arr: Any                    # (L,)
    scaled_omega_arr: Any         # (L,)
    weighted_leg_all: Any         # (L, nleg_all) (2l+1)-weighted, unscaled
    weighted_scaled_leg: Any      # (L, nleg) (2l+1)-weighted, delta-scaled
    # Flux tables: the quadrature contraction (mu W) @ {GC, B, mathscr_b}
    # per hemisphere, folded at solve time so the flux evaluators gather
    # per-layer VECTORS instead of (2N, 2N) blocks (and, on the batched
    # lanes path, so GC need not be materialized at all for only_flux).
    fvec_up: Any = None           # (L, 2N)
    fvec_dn: Any = None           # (L, 2N)
    fb_up: Any = None             # (L,)  beam contraction (zeros if no beam)
    fb_dn: Any = None             # (L,)
    fi_up: Any = None             # (L, Ns) iso contraction (zeros if no iso)
    fi_dn: Any = None             # (L, Ns)


_register(
    DisortSolution,
    data_fields=[
        "G", "K", "GC", "B", "mathscr_b", "tau_arr", "scaled_tau_with_0",
        "scale_tau", "mu_arr_pos", "W", "mu0", "I0", "phi0",
        "rescale_factor", "omega_arr", "f_arr", "scaled_omega_arr",
        "weighted_leg_all", "weighted_scaled_leg",
        "fvec_up", "fvec_dn", "fb_up", "fb_dn", "fi_up", "fi_dn",
    ],
    meta_fields=["config"],
)
