"""Generate docs/examples/stamnes_families.ipynb (run from repo root)."""

import nbformat as nbf

nb = nbf.v4.new_notebook()
md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell

cells = [
    md("""# Stamnes golden-file verification, interactively

The reference ships a demonstration notebook per test family
(`*_test.ipynb`); this single notebook replays a representative case
from EVERY family against the stored Stamnes DISORT 4.0.99 golden
outputs, using the same `_compare` harness and thresholds as the test
suite (flux rel. err < 1e-3, intensity < 1e-2 wherever significant).
Runs on CPU f64; the full 40-golden sweep lives in
`tests/test_stamnes*.py`."""),
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
        sys.path.insert(0, os.path.join(p, "tests"))
        break

import warnings
import numpy as np
import jax
jax.config.update("jax_enable_x64", True)

from test_stamnes import CASES as CASES_MAIN
from test_stamnes_sources import CASES as CASES_SRC
CASES = {**CASES_MAIN, **CASES_SRC}
print(len(CASES), "encoded golden cases available")"""),
    md("""## One representative case per family

| case | family | exercises |
|---|---|---|
| 1a | isotropic scattering | thin layer, beam at mu0 = 0.1 |
| 2b | Rayleigh | omega ~ 1 conservative limit |
| 3a | Henyey-Greenstein | delta-M + NT corrections |
| 4b | Haze-L | 82-coeff phase function, NQuad = 32 |
| 5a | Cloud C.1 | 299-coeff phase function, NQuad = 48, tau = 64 |
| 6c | no scattering | Lambertian BDRF, flux-only |
| 7c | absorption+scattering | ALL sources + delta-M + NT |
| 8b | multi-layer isotropic | 2 layers, top boundary source |
| 9b | general multi-layer | 6 distinct layers, anisotropic |"""),
    code("""from helpers import run_and_compare

PICK = {
    "1a": "isotropic, thin layer, beam mu0=0.1",
    "2b": "Rayleigh, omega ~ 1",
    "3a": "Henyey-Greenstein, delta-M + NT",
    "4b": "Haze-L 82-coeff phase fn, NQuad=32",
    "5a": "Cloud C.1 299-coeff, NQuad=48, tau=64",
    "6c": "no scattering + Lambertian BDRF",
    "7c": "all sources + delta-M + NT",
    "8b": "2-layer isotropic, top boundary source",
    "9b": "6 distinct layers, anisotropic",
}

for name, what in PICK.items():
    case = CASES[name]
    if callable(case):
        case = case()
    print(f"=== case {name}: {what} ===")
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        run_and_compare(
            name, dict(case["kwargs"]),
            deg_around_beam=case.get("deg_around_beam", 0),
        )                      # asserts the reference thresholds
print()
print("every family passes the reference's DISORT comparison thresholds")"""),
]

nb["cells"] = cells
nb["metadata"]["kernelspec"] = {
    "display_name": "Python 3", "language": "python", "name": "python3"}
with open("docs/examples/stamnes_families.ipynb", "w") as f:
    nbf.write(nb, f)
print("written")
