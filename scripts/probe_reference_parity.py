"""Probe: max relative deviation of our f64 fluxes vs the live reference
implementation across every encoded Stamnes case (informs the rtol of
tests/test_reference_parity.py)."""

import sys
import time
import warnings

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")
sys.path.insert(0, "/root/reference/src")

import jax

jax.config.update("jax_platforms", "cpu")

import pythonic_disort_tpu as pdt
import PythonicDISORT

from test_stamnes import CASES as CASES_MAIN
from test_stamnes_sources import CASES as CASES_SRC

ALL = {}
ALL.update(CASES_MAIN)
ALL.update(CASES_SRC)


def main():
    names = sys.argv[1:] or sorted(ALL)
    for name in names:
        case = ALL[name]
        if callable(case):
            case = case()
        kw = dict(case["kwargs"])
        t0 = time.time()
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            ours = pdt.pydisort(**kw)
            ref = PythonicDISORT.pydisort(**kw)
        tau_max = float(np.max(np.atleast_1d(kw["tau_arr"])))
        tau = np.linspace(0, tau_max, 23)
        scale = None
        rows = []
        o_fu = np.asarray(ours[1](tau))
        r_fu = np.asarray(ref[1](tau))
        o_fd, o_fdir = ours[2](tau)
        r_fd, r_fdir = ref[2](tau)
        scale = max(
            np.abs(r_fu).max(), np.abs(np.asarray(r_fd)).max(),
            np.abs(np.asarray(r_fdir)).max(), 1e-300,
        )
        for lbl, o, r in [
            ("fup", o_fu, r_fu),
            ("fdn", np.asarray(o_fd), np.asarray(r_fd)),
            ("fdir", np.asarray(o_fdir), np.asarray(r_fdir)),
        ]:
            # north-star metric: |o-r| <= rtol|r| + atol*scale; print the
            # max effective rtol after removing the atol floor
            err = (np.abs(o - r) - 1e-8 * scale) / np.maximum(np.abs(r), 1e-300)
            rows.append(f"{lbl} {err.max():.2e}")
        print(f"{name}: " + "  ".join(rows) + f"   ({time.time()-t0:.1f}s)",
              flush=True)


if __name__ == "__main__":
    main()
