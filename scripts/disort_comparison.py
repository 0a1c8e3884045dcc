"""DISORT-comparison study: error tables vs Stamnes' FORTRAN DISORT.

Executable counterpart of the reference notebook's section 6
("Comparisons against Stamnes' DISORT", `/root/reference/docs/
Pythonic-DISORT.ipynb` cells 330-339): runs every golden Stamnes case
through the public `pydisort` API (f64) and prints one row per case
with the maximum pointwise differences and difference ratios against
the DISORT 4.0.99 outputs.  The committed output lives in
``docs/comparison.md``; re-run this script to regenerate it.

Usage: ``python scripts/disort_comparison.py [--markdown]``
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


def main(markdown=False):
    from math import pi

    import pythonic_disort_tpu as pdt
    from pythonic_disort_tpu.utils.compare import compare
    from helpers import load_golden
    import test_stamnes as ts

    rows = []
    for name in sorted(ts.CASES):
        case = ts.CASES[name]
        if callable(case):
            case = case()
        kwargs = dict(case["kwargs"])
        deg = case.get("deg_around_beam", 0)
        outputs = pdt.pydisort(**kwargs)
        mu_arr = outputs[0]
        flux_up, flux_down = outputs[1], outputs[2]
        u = outputs[4] if len(outputs) > 4 else None

        reorder = np.argsort(mu_arr)
        mu_ro = mu_arr[reorder]
        mu0 = kwargs["mu0"]
        mask = (
            np.abs(np.arccos(np.abs(mu_ro)) - np.arccos(mu0)) * 180 / pi > deg
            if mu0 > 0
            else np.ones_like(mu_ro, dtype=bool)
        )
        golden = load_golden(name)
        out = compare(
            golden, mask, reorder, flux_up, flux_down, u, verbose=False
        )
        fr = max(out[1].max(), out[3].max(), out[5].max())
        fd = max(out[0].max(), out[2].max(), out[4].max())
        if u is not None:
            ir, idiff = out[7].max(), out[6].max()
        else:
            ir = idiff = float("nan")
        rows.append((name, fd, fr, idiff, ir))

    if markdown:
        print("| case | max flux diff | max flux ratio | max intensity diff | max intensity ratio |")
        print("|---|---|---|---|---|")
        for r in rows:
            cells = [r[0]] + [
                ("—" if np.isnan(v) else f"{v:.1e}") for v in r[1:]
            ]
            print("| " + " | ".join(cells) + " |")
    else:
        print(f"{'case':6s} {'flux diff':>10s} {'flux ratio':>11s} "
              f"{'int diff':>10s} {'int ratio':>10s}")
        for r in rows:
            print(f"{r[0]:6s} {r[1]:10.2e} {r[2]:11.2e} "
                  f"{r[3]:10.2e} {r[4]:10.2e}")


if __name__ == "__main__":
    main(markdown="--markdown" in sys.argv)
