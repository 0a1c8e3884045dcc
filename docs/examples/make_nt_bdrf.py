import nbformat as nbf

nb = nbf.v4.new_notebook()
md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

cells = []
cells.append(md("""# NT-corrected intensity over reflecting surfaces (BDRF)

Family 3/6-style demonstration (reference `pydisotest/3_test.py`,
`6_test.py` and companion notebooks): a Henyey-Greenstein haze with
delta-M truncation and Nakajima-Tanaka (TMS/IMS) intensity
corrections, solved over three lower boundaries — a black surface, a
Lambertian surface, and the Hapke bidirectional reflectance used by
the reference's test 6 family.  Runs on CPU (float64) so it executes
anywhere; the same API runs unchanged on TPU in float32."""))

cells.append(code("""import os, sys
import jax
jax.config.update("jax_platforms", "cpu")
for up in ("../..", "."):
    p = os.path.abspath(up)
    if os.path.isdir(os.path.join(p, "pythonic_disort_tpu")):
        sys.path.insert(0, p)
        break

import numpy as np
jax.config.update("jax_enable_x64", True)

import pythonic_disort_tpu as pdt
from pythonic_disort_tpu.models.surfaces import lambertian, hapke_fourier_modes
print(jax.devices())"""))

cells.append(md("""## 1. The atmosphere

A single optically moderate haze layer (g = 0.75, 32 Legendre
coefficients), direct beam at `mu0 = 0.6`.  `f_arr = g**NQuad`
activates delta-M scaling, and `NT_cor=True` makes the returned `u`
the TMS/IMS-corrected intensity — exactly the reference's default
output for such problems (reference `pydisort.py:643-698`)."""))

cells.append(code("""NQuad = 16
g = 0.75
leg = g ** np.arange(32)
base = dict(
    tau_arr=2.0, omega_arr=0.9, NQuad=NQuad, Leg_coeffs_all=leg,
    mu0=0.6, I0=np.pi, phi0=0.0, f_arr=leg[NQuad], NT_cor=True,
)

def solve(**surface):
    mu_arr, flux_up, flux_down, u0, u = pdt.pydisort(**base, **surface)
    return mu_arr, flux_up, flux_down, u

mu_arr, fu_black, fd_black, u_black = solve()
print("streams:", mu_arr.round(3))"""))

cells.append(md("""## 2. Lambertian and Hapke surfaces

BDRFs enter as Fourier cosine modes (`BDRF_Fourier_modes`, matching
the reference's interface).  `models.surfaces` ships the two built-ins
the reference's test families use: `lambertian(albedo)` (one constant
mode) and the Hapke BDRF (modes computed by quadrature over the
azimuth; reference `6_test.py:11-24`)."""))

cells.append(code("""_, fu_lamb, fd_lamb, u_lamb = solve(BDRF_Fourier_modes=lambertian(0.3))
hapke_modes = hapke_fourier_modes(NQuad // 2, B0=1.0, HH=0.06, W=0.6)
_, fu_hapke, fd_hapke, u_hapke = solve(BDRF_Fourier_modes=hapke_modes)

tau_probe = np.array([0.0, 1.0, 2.0])
for name, fu in [("black", fu_black), ("lambertian 0.3", fu_lamb),
                 ("hapke", fu_hapke)]:
    print(f"flux_up [{name:15s}] at tau={tau_probe}: ",
          np.round(np.asarray(fu(tau_probe)), 5))"""))

cells.append(md("""## 3. NT-corrected intensities

The corrected `u(tau, phi)` closure returns shape `(NQuad, Ntau, Nphi)`
(first half upward ordinates).  The surface brightens the upward
hemisphere; the Hapke surface does so anisotropically (compare the
azimuth columns), while the Lambertian lift is azimuth-independent in
the reflected component."""))

cells.append(code("""phi = np.array([0.0, np.pi])
up_toa = {}
for name, u in [("black", u_black), ("lambertian", u_lamb),
                ("hapke", u_hapke)]:
    vals = np.asarray(u(0.0, phi))              # TOA, (NQuad, Nphi)
    up_toa[name] = vals[: NQuad // 2, :]        # first half: upward ordinates
    print(f"{name:10s} TOA upward intensity (phi=0):   ",
          np.round(up_toa[name][:, 0], 5))
print("hapke/lambertian anisotropy ratio (phi=0 vs pi):",
      np.round(up_toa['hapke'][:, 0] / up_toa['hapke'][:, 1], 4))"""))

cells.append(md("""## 4. Fourier convergence of the corrected intensity

`return_Fourier_error=True` reports the last Fourier mode's Cauchy
convergence estimate; it composes with the other closure flags
(including `is_antiderivative_wrt_tau`, a combination round-5 fixed
and the reference's own implementation cannot evaluate)."""))

cells.append(code("""u_vals, ferr = u_hapke(np.array([1.0]), phi, return_Fourier_error=True)
print("Fourier error estimate:", float(ferr))
anti, ferr_anti = u_hapke(
    np.array([1.0]), phi,
    is_antiderivative_wrt_tau=True, return_Fourier_error=True,
)
print("antiderivative + Fourier error also supported:", float(ferr_anti))"""))

nb["cells"] = cells
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}
with open("docs/examples/nt_bdrf.ipynb", "w") as f:
    nbf.write(nb, f)
print("written")
