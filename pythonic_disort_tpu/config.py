"""Global numerical configuration.

The discrete-ordinates method is a spectral method: its accuracy target
(rtol ~ 1e-6 against the reference implementation) requires float64
accumulation in the eigendecomposition and boundary-value solve.  JAX
disables x64 by default, so the package enables it on import unless the
user opts out via the environment variable ``PYDISORT_TPU_NO_X64=1``.

All core functions are dtype-polymorphic: pass float32 inputs (and
``dtype=jnp.float32`` where accepted) to run the fast single-precision
path on TPU; the float64 path is the verification/parity path.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_X64_ENV_OPT_OUT = "PYDISORT_TPU_NO_X64"


def enable_x64_if_requested() -> None:
    """Enable JAX x64 mode unless the user opted out via env var."""
    if os.environ.get(_X64_ENV_OPT_OUT, "0") != "1":
        jax.config.update("jax_enable_x64", True)


def default_dtype() -> jnp.dtype:
    """The default solve dtype: float64 when x64 is on, else float32."""
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
