import nbformat as nbf

nb = nbf.v4.new_notebook()
md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

cells = []
cells.append(md("""# Quickstart: solve -> fluxes -> NT intensity -> actinic -> interpolation

Runnable end-to-end demonstration of the TPU-native discrete-ordinates
framework, mirroring the reference's per-family demo notebooks
(reference `README.md:39-52`).  Runs on CPU (float64) so it executes
anywhere; the same API runs unchanged on TPU in float32.

Problem: a 4-layer atmosphere with a Henyey-Greenstein haze
(g = 0.75, 32 Legendre coefficients), a direct solar beam, delta-M
truncation with Nakajima-Tanaka intensity corrections, a linear-in-tau
thermal source, and a Lambertian surface."""))

cells.append(code("""import os, sys
import jax
# CPU demo.  Use the config (not the JAX_PLATFORMS env var): with some
# PJRT plugins registered, selecting "cpu" via the env var still
# initializes the plugin and its host->device transfer can round f64
# at the ULP level; the config route never activates it.
jax.config.update("jax_platforms", "cpu")
# when executed from docs/examples, add the repo root
for up in ("../..", "."):
    p = os.path.abspath(up)
    if os.path.isdir(os.path.join(p, "pythonic_disort_tpu")):
        sys.path.insert(0, p)
        break

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)

import pythonic_disort_tpu as pdt
print(jax.devices())"""))

cells.append(md("""## 1. Define the atmosphere and solve

`pydisort` is the drop-in reference-compatible entry point
(reference `pydisort.py:13`): it returns `mu_arr` and evaluation
closures.  With `NT_cor=True` the returned `u` is the
TMS/IMS-corrected intensity, exactly as in the reference."""))

cells.append(code("""NQuad = 16
NLeg_all = 32
g = 0.75
leg_coeffs_all = g ** np.arange(NLeg_all)

tau_arr = np.array([0.5, 1.5, 3.0, 5.0])     # layer lower boundaries
NLayers = len(tau_arr)
omega_arr = np.array([0.9, 0.85, 0.8, 0.7])
Leg = np.tile(leg_coeffs_all, (NLayers, 1))
f_arr = Leg[:, NQuad]                         # delta-M: f = g_NQuad

mu0, I0, phi0 = 0.6, np.pi, 0.0

# linear-in-tau thermal emission per layer (columns: [slope, intercept])
s_poly = np.stack([np.full(NLayers, 0.01), np.full(NLayers, 0.1)], axis=1)

mu_arr, flux_up, flux_down, u0, u = pdt.pydisort(
    tau_arr, omega_arr, NQuad, Leg, mu0, I0, phi0,
    f_arr=f_arr, NT_cor=True,
    s_poly_coeffs=s_poly,
    BDRF_Fourier_modes=[0.2],                 # Lambertian albedo 0.2
)
print("quadrature nodes (mu > 0):", np.round(mu_arr[:NQuad // 2], 4))"""))

cells.append(md("""## 2. Fluxes

The closures evaluate the semi-analytic solution at arbitrary tau
after the one-time solve."""))

cells.append(code("""tau_grid = np.linspace(0, tau_arr[-1], 9)
fup = flux_up(tau_grid)
fdn_diffuse, fdn_direct = flux_down(tau_grid)
net = fdn_diffuse + fdn_direct - fup
print(f"{'tau':>6} {'F_up':>10} {'F_dn_diff':>10} {'F_dn_dir':>10} {'net dn':>10}")
for t, a, b, c, d in zip(tau_grid, fup, fdn_diffuse, fdn_direct, net):
    print(f"{t:6.2f} {a:10.5f} {b:10.5f} {c:10.5f} {d:10.5f}")"""))

cells.append(md("""## 3. NT-corrected intensity

`u(tau, phi)` returns the full azimuthal intensity, (2N, Ntau, Nphi);
with delta-M + `NT_cor=True` it already includes the TMS/IMS
single-scatter corrections (reference `pydisort.py:643-698`)."""))

cells.append(code("""phi_grid = np.linspace(0, 2 * np.pi, 5, endpoint=False)
uu = u(tau_grid, phi_grid)
print("u shape (2N, Ntau, Nphi):", uu.shape)
print("downward intensity nearest the beam azimuth, mid-atmosphere:")
print(np.round(uu[NQuad // 2:, len(tau_grid) // 2, 0], 6))

ferr = u(np.array([2.0]), np.array([0.0]), return_Fourier_error=True)[1]
print("Fourier convergence estimate:", float(ferr))"""))

cells.append(md("""## 4. Actinic fluxes

`generate_diff_act_flux_funcs` wraps `u0` into upward/downward diffuse
actinic fluxes, including the automatic delta-M reclassification of
the direct beam (reference `subroutines.py:258-318`)."""))

cells.append(code("""from pythonic_disort_tpu.subroutines import generate_diff_act_flux_funcs

act_up, act_dn = generate_diff_act_flux_funcs(u0)
print("actinic up:  ", np.round(act_up(tau_grid)[:5], 5))
print("actinic down:", np.round(act_dn(tau_grid)[:5], 5))"""))

cells.append(md("""## 5. Interpolation to off-quadrature angles

Barycentric polynomial interpolation per hemisphere
(reference `subroutines.py:614-705`)."""))

cells.append(code("""from pythonic_disort_tpu.subroutines import interpolate

u_interp = interpolate(u)
print("u at mu=0.55, tau=2, phi=0:", float(u_interp(0.55, 2.0, 0.0)))
u0_interp = interpolate(u0)
print("u0 at mu=-0.3, tau=2:", float(u0_interp(-0.3, 2.0)))"""))

cells.append(md("""## 6. Exact antiderivatives

Every output has an exact tau-antiderivative, exposed through
`is_antiderivative_wrt_tau=True` (matching the reference).  The
antiderivative is per-layer (each layer's closed form carries its own
integration constant), so the fundamental theorem of calculus holds
WITHIN a layer; verify against numerical quadrature inside layer 2
(tau in (0.5, 1.5)).  The I-family tests do this exhaustively."""))

cells.append(code("""from scipy.integrate import quad

a, b = 0.6, 1.4                   # both inside layer 2
# single-point closure outputs are squeezed to scalars
F = lambda t: float(flux_up(np.array([t]), is_antiderivative_wrt_tau=True))
num, _ = quad(lambda t: float(flux_up(np.array([t]))), a, b)
print(f"antiderivative difference: {F(b) - F(a):.8f}")
print(f"numerical integral:        {num:.8f}")"""))

cells.append(md("""## 7. The production batched API

The reference solves one column per call; the framework's production
path solves a whole (columns x bands) batch as one compiled program
and shards it over a TPU mesh (`parallel.solve_fluxes_sharded`).
Here: 8 columns on CPU."""))

cells.append(code("""import jax.numpy as jnp
from pythonic_disort_tpu import DisortConfig
from pythonic_disort_tpu.parallel import make_batched_problem, solve_fluxes

B = 8
rng = np.random.default_rng(0)
tau_b = np.cumsum(rng.uniform(0.2, 1.0, (B, NLayers)), axis=1)
omega_b = rng.uniform(0.5, 0.95, (B, NLayers))
leg_b = np.tile(leg_coeffs_all, (B, NLayers, 1))
config = DisortConfig(
    nquad=NQuad, nleg=NQuad, nleg_all=NLeg_all, nfourier=1,
    nlayers=NLayers, nscoeffs=0, nbdrf=0, has_beam=True,
    only_flux=True, has_deltam=True,
)
prob = make_batched_problem(
    config, tau_b, omega_b, leg_b,
    rng.uniform(0.3, 1.0, B), np.full(B, np.pi),
    f_arr=leg_b[..., NQuad], dtype=jnp.float64,
)
fup_b, fdn_b, fdir_b = jax.jit(solve_fluxes)(prob, jnp.asarray(tau_b))
print("batched flux_up shape (B, Ntau):", fup_b.shape)
print("column 0 upward flux at layer boundaries:", np.round(np.asarray(fup_b[0]), 5))"""))

nb["cells"] = cells
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}
with open("docs/examples/quickstart.ipynb", "w") as f:
    nbf.write(nb, f)
print("written")
