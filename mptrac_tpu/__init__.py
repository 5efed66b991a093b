"""mptrac_tpu — TPU-native Lagrangian particle dispersion framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of MPTRAC
(Massive-Parallel Trajectory Calculations): kinematic/diabatic advection
of millions of air parcels through time-interpolated reanalysis wind
fields, stochastic turbulence and convection, chemistry, deposition and
gridded output — designed for TPU device meshes via jax.sharding/pjit
rather than the reference's OpenMP/OpenACC/MPI stack.

Positions and times are tracked in float64 (the reference computes in
double over float32 met fields); x64 mode is enabled at import unless
``MPTRAC_NO_X64`` is set.
"""

import os

import jax

if not os.environ.get("MPTRAC_NO_X64"):
    jax.config.update("jax_enable_x64", True)

# If the environment selects a platform whose registration failed (e.g.
# a remote TPU plugin that could not reach its service), fall back to
# CPU instead of failing every computation.
try:
    from jax._src import xla_bridge as _xb
    _sel = os.environ.get("JAX_PLATFORMS", "")
    if _sel and not any(p in _xb._backend_factories
                        for p in _sel.split(",") if p):
        jax.config.update("jax_platforms", "cpu")
except Exception:
    pass

from mptrac_tpu import constants  # noqa: E402
from mptrac_tpu.config import Ctl, read_ctl  # noqa: E402
from mptrac_tpu.types import Atm, Cache, Clim, Met, stack_met  # noqa: E402
from mptrac_tpu.timeutil import time2jsec, jsec2time  # noqa: E402

__version__ = "0.1.0"

__all__ = [
    "Atm", "Cache", "Clim", "Ctl", "Met", "constants", "jsec2time",
    "read_ctl", "stack_met", "time2jsec",
]
