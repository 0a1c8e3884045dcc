"""Generate docs/examples/longwave_thermal.ipynb (run from repo root)."""

import nbformat as nbf

nb = nbf.v4.new_notebook()
md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

cells = [
    md("""# Longwave / thermal demo: blackbody emission, emissivity, band integration

Mirrors the reference's family-6/7 demonstrations (no solar beam;
internal blackbody emission as per-layer polynomials in tau, a surface
with Lambertian reflectance and the matching Kirchhoff emissivity, and
band-integrated Planck boundary contributions).  Runs on CPU f64."""),
    code("""import os, sys
import jax
# CPU demo.  Use the config (not the JAX_PLATFORMS env var): with some
# PJRT plugins registered, selecting "cpu" via the env var still
# initializes the plugin and its host->device transfer can round f64
# at the ULP level; the config route never activates it.
jax.config.update("jax_platforms", "cpu")
for up in ("../..", "."):
    p = os.path.abspath(up)
    if os.path.isdir(os.path.join(p, "pythonic_disort_tpu")):
        sys.path.insert(0, p)
        break

import numpy as np
import jax
jax.config.update("jax_enable_x64", True)

import pythonic_disort_tpu as pdt
from pythonic_disort_tpu.subroutines import (
    Planck, blackbody_contrib_to_BCs, generate_s_poly_coeffs,
    generate_emissivity_from_BDRF,
)"""),
    md("""## 1. A 4-layer thermal atmosphere

Temperatures at layer boundaries define a linear-in-tau emission
polynomial per layer (`generate_s_poly_coeffs`, the DISORT-equivalent
construction); the surface and space boundary intensities come from
band-integrated Planck functions."""),
    code("""tau_arr = np.array([0.4, 1.0, 2.0, 3.5])
omega_arr = np.full(4, 0.05)                  # weakly scattering longwave
NQuad = 16
Leg = np.zeros((4, NQuad + 1)); Leg[:, 0] = 1

TEMPER = np.array([250.0, 260.0, 272.0, 285.0, 300.0])   # K, L+1 boundaries
WVNMLO, WVNMHI = 400.0, 500.0                             # cm^-1 band

s_poly = generate_s_poly_coeffs(tau_arr, TEMPER, WVNMLO, WVNMHI)
print("s_poly_coeffs (L, 2):\\n", np.round(s_poly, 6))

albedo = 0.1
emissivity = generate_emissivity_from_BDRF(NQuad // 2, albedo)
b_pos = emissivity * blackbody_contrib_to_BCs(TEMPER[-1], WVNMLO, WVNMHI)
b_neg = 0.0                                   # no downwelling at TOA
print("surface blackbody BC:", float(b_pos), " emissivity:", float(emissivity))"""),
    code("""mu_arr, flux_up, flux_down, u0 = pdt.pydisort(
    tau_arr, omega_arr, NQuad, Leg, 0.0, 0.0, 0.0,     # no beam
    b_pos=b_pos, b_neg=b_neg,
    s_poly_coeffs=s_poly,
    BDRF_Fourier_modes=[albedo],
    only_flux=True,
)
tg = np.linspace(0, tau_arr[-1], 8)
fup = flux_up(tg)
fdn, _ = flux_down(tg)
print(f"{'tau':>6} {'F_up':>10} {'F_down':>10} {'net up':>10}")
for t, a, b in zip(tg, fup, fdn):
    print(f"{t:6.2f} {a:10.5f} {b:10.5f} {a - b:10.5f}")"""),
    md("""## 2. Sanity checks

Upwelling at the top of atmosphere should sit between the Planck
emissions of the coldest and warmest temperatures in the column
(grey-body bounds), and heating rates follow from the net flux
divergence."""),
    code("""# band-integrated blackbody FLUX bounds: pi x band-integrated intensity
B_cold = np.pi * blackbody_contrib_to_BCs(TEMPER.min(), WVNMLO, WVNMHI)
B_warm = np.pi * blackbody_contrib_to_BCs(TEMPER.max(), WVNMLO, WVNMHI)
olr = float(flux_up(np.array([0.0])))
print(f"OLR {olr:.5f} within grey-body bounds ({B_cold:.5f}, {B_warm:.5f}):",
      B_cold < olr < B_warm)
assert B_cold < olr < B_warm

# net-flux divergence via the exact antiderivative (per layer)
net = lambda t: float(flux_up(np.array([t]))) - float(flux_down(np.array([t]))[0])
print("net flux at layer mids:", [round(net(t), 5) for t in (0.2, 0.7, 1.5, 2.7)])"""),
    md("""## 3. On-device Planck sources (production path)

The host route above uses adaptive quadrature
(`scipy.integrate.quad_vec`).  For pod-scale spectral sweeps the Planck
band integration runs ON DEVICE inside the compiled program:
`ops.planck.s_poly_coeffs_from_temper` is jittable (fixed-order
Gauss–Legendre panels anchored at the emission peak), so a temperature
profile goes straight into a batched multi-band solve with no
host-side source precomputation (see
`tests/test_thermal_device.py` for the 48-layer, 3-band end-to-end
parity test against this host route)."""),
    code("""import jax
import jax.numpy as jnp
from pythonic_disort_tpu.ops.planck import s_poly_coeffs_from_temper
from pythonic_disort_tpu.parallel import make_batched_problem, solve_fluxes

@jax.jit
def device_longwave(tau_j, temper_j):
    s_dev = s_poly_coeffs_from_temper(tau_j, temper_j, WVNMLO, WVNMHI)
    cfg = pdt.DisortConfig(
        nquad=NQuad, nleg=Leg.shape[1], nleg_all=Leg.shape[1], nfourier=1,
        nlayers=len(tau_arr), nscoeffs=2, nbdrf=0, has_beam=False,
        only_flux=True, has_deltam=False,
    )
    prob = make_batched_problem(
        cfg, tau_j[None], jnp.asarray(omega_arr)[None],
        jnp.asarray(Leg)[None], np.zeros(1), np.zeros(1),
        s_poly_coeffs=s_dev[None], dtype=jnp.float64,
    )
    return solve_fluxes(prob, tau_j[None])

fup_d, fdn_d, _ = device_longwave(jnp.asarray(tau_arr), jnp.asarray(TEMPER))
print("device-Planck flux_up at boundaries:", np.round(np.asarray(fup_d[0]), 5))
# source-coefficient parity with the host adaptive-quadrature route
s_dev = np.asarray(s_poly_coeffs_from_temper(
    jnp.asarray(tau_arr), jnp.asarray(TEMPER), WVNMLO, WVNMHI))
rel = np.abs(s_dev - s_poly).max() / np.abs(s_poly).max()
print(f"device vs host Planck source coefficients: max rel diff {rel:.2e}")
assert rel < 1e-6"""),
]

nb["cells"] = cells
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}
with open("docs/examples/longwave_thermal.ipynb", "w") as f:
    nbf.write(nb, f)
print("written")
