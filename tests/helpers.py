"""Shared helpers for the Stamnes golden-file verification tests."""

import os
from math import pi

import numpy as np

import pythonic_disort_tpu as pdt
from pythonic_disort_tpu.utils.compare import compare

DATA = os.path.join(os.path.dirname(__file__), "data")
STAMNES = os.path.join(DATA, "stamnes")


def load_golden(name):
    return np.load(os.path.join(STAMNES, f"{name}_test.npz"))


def run_and_compare(golden_name, kwargs, deg_around_beam=0, intensity=True):
    """Run ``pydisort`` and assert the reference accuracy thresholds.

    Thresholds are those of every reference Stamnes test
    (e.g. ``pydisotest/1_test.py:78-81``): flux relative error < 1e-3
    wherever |diff| > 1e-3; intensity relative error < 1e-2 wherever
    |diff| > 1e-3.  Intensity comparison masks angles within
    ``deg_around_beam`` degrees of the beam.
    """
    outputs = pdt.pydisort(**kwargs)
    mu_arr = outputs[0]
    flux_up, flux_down = outputs[1], outputs[2]
    u = outputs[4] if (intensity and len(outputs) > 4) else None

    reorder_mu = np.argsort(mu_arr)
    mu_arr_RO = mu_arr[reorder_mu]
    mu0 = kwargs["mu0"]
    mu_to_compare = (
        np.abs(np.arccos(np.abs(mu_arr_RO)) - np.arccos(mu0)) * 180 / pi
        > deg_around_beam
    )

    results = load_golden(golden_name)
    out = compare(results, mu_to_compare, reorder_mu, flux_up, flux_down, u)
    (dfu, rfu, dfdd, rfdd, dfdr, rfdr) = out[:6]

    assert np.max(rfu[dfu > 1e-3], initial=0) < 1e-3, "flux_up mismatch"
    assert np.max(rfdd[dfdd > 1e-3], initial=0) < 1e-3, "flux_down diffuse mismatch"
    assert np.max(rfdr[dfdr > 1e-3], initial=0) < 1e-3, "flux_down direct mismatch"
    if u is not None:
        diff, diff_ratio = out[6], out[7]
        assert np.max(diff_ratio[diff > 1e-3], initial=0) < 1e-2, "intensity mismatch"
    return outputs
