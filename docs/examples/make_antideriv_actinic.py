import nbformat as nbf

nb = nbf.v4.new_notebook()
md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

cells = []
cells.append(md("""# Antiderivatives, actinic fluxes, and mu-interpolation

Family-I-style demonstration (reference's "integrals" notebook and
`subroutines.py:258-318`): exact tau-antiderivatives of every output
closure (for layer-integrated heating/energy budgets), diffuse actinic
fluxes with the delta-scaling reclassification, and barycentric
interpolation of the intensity to off-quadrature polar angles.  Runs
on CPU (float64); the same API runs unchanged on TPU in float32."""))

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
from pythonic_disort_tpu.utils.actinic import generate_diff_act_flux_funcs
from pythonic_disort_tpu.utils.interpolate import interpolate
print(jax.devices())"""))

cells.append(md("""## 1. Solve a two-layer beam + thermal problem"""))

cells.append(code("""NQuad = 16
leg = 0.7 ** np.arange(24)
tau_arr = np.array([1.0, 3.0])
Leg = np.tile(leg, (2, 1))
mu_arr, flux_up, flux_down, u0, u = pdt.pydisort(
    tau_arr, np.array([0.8, 0.6]), NQuad, Leg,
    mu0=0.5, I0=np.pi, phi0=0.0, f_arr=Leg[:, NQuad],
    s_poly_coeffs=np.array([[0.05, 0.01], [0.05, 0.01]]),
)
print("flux_up at boundaries:", np.round(flux_up(tau_arr), 6))"""))

cells.append(md("""## 2. Exact tau-antiderivatives

Every closure accepts `is_antiderivative_wrt_tau=True` and returns the
exact antiderivative of its output (reference's same-named flag), so
layer-integrated quantities are differences of two evaluations — no
numerical quadrature.  Check against a fine trapezoid rule:"""))

cells.append(code("""a, b = 0.3, 2.4
F = lambda t: np.asarray(flux_up(t))
Fa = lambda t: np.asarray(flux_up(t, is_antiderivative_wrt_tau=True))
exact = Fa(b) - Fa(a)
grid = np.linspace(a, b, 4001)
trapz = np.trapezoid(F(grid), grid)
print(f"integral of flux_up over [{a}, {b}]")
print("  antiderivative difference:", exact)
print("  4001-pt trapezoid:        ", trapz)
print("  relative agreement:       ", abs(exact - trapz) / abs(trapz))"""))

cells.append(md("""## 3. Actinic (scalar) fluxes

`generate_diff_act_flux_funcs(u0)` builds the diffuse actinic flux
closures from the zeroth Fourier mode (reference
`subroutines.py:258-318`), including the delta-M reclassification of
the scaled direct beam into the downward diffuse actinic flux."""))

cells.append(code("""act_up, act_down = generate_diff_act_flux_funcs(u0)
tau_probe = np.array([0.0, 0.5, 1.0, 2.0, 3.0])
print("diffuse actinic up:  ", np.round(act_up(tau_probe), 6))
print("diffuse actinic down:", np.round(act_down(tau_probe), 6))
# antiderivative flag composes here too
int_act = act_down(3.0, is_antiderivative_wrt_tau=True) - \\
          act_down(0.0, is_antiderivative_wrt_tau=True)
print("column-integrated downward actinic flux:", float(int_act))"""))

cells.append(md("""## 4. Interpolation to off-quadrature angles

`interpolate(u)` wraps the intensity closure in a barycentric
polynomial interpolant over the quadrature ordinates (reference
`subroutines.py:484-531`), hemisphere-by-hemisphere, so the intensity
can be probed at arbitrary viewing angles `mu`:"""))

cells.append(code("""u_interp = interpolate(u)
mus = np.array([0.35, 0.72, -0.41])
vals = u_interp(mus, 1.5, 0.0)
print("u at off-quadrature mu:", np.round(np.asarray(vals), 6))
# sanity: interpolating AT a quadrature node reproduces the closure
node = float(mu_arr[3])
direct = float(np.asarray(u(1.5, 0.0))[3])
via_interp = float(np.asarray(u_interp(np.array([node]), 1.5, 0.0)))
print("node reproduction error:", abs(direct - via_interp))"""))

nb["cells"] = cells
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}
with open("docs/examples/antideriv_actinic_interp.ipynb", "w") as f:
    nbf.write(nb, f)
print("written")
