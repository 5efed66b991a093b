"""fp32 compute mode: dtype stability through the pipeline and
accuracy vs the float64 reference path (framework extension — the
reference model is double-only; float64 is software-emulated on TPU,
so fp32 is the TPU fast path)."""

import jax
import jax.numpy as jnp
import numpy as np

import __graft_entry__ as g
from mptrac_tpu.ops.fast_interp import build_advect_pack
from mptrac_tpu.physics import pipeline
from mptrac_tpu.types import astype_state


def test_fp32_pipeline_stable_and_accurate():
    ctl, clim, met01, atm, cache = g._make_setup(4000)
    a32, c32, m32 = astype_state(atm, cache, met01)
    assert a32.lon.dtype == jnp.float32
    assert a32.time.dtype == jnp.float64          # jsec stays f64
    assert c32.dt.dtype == jnp.float32

    pack32 = build_advect_pack(m32)
    pack64 = build_advect_pack(met01)
    step = jax.jit(lambda m, a, c, t, p: pipeline.run_timestep(
        ctl, clim, m, a, c, t, pack=p))

    a, c = a32, c32
    a64, c64 = atm, cache
    for i in range(6):
        t = jnp.asarray((i + 1) * 180.0)
        a, c = step(m32, a, c, t, pack32)
        a64, c64 = step(met01, a64, c64, t, pack64)

    # no dtype creep through 6 full steps
    assert a.lon.dtype == jnp.float32
    assert a.p.dtype == jnp.float32
    assert a.q["m"].dtype == jnp.float32
    assert c.dt.dtype == jnp.float32

    # same trajectories to f32 rounding (same RNG draws, cast)
    dlon = np.abs(np.asarray(a.lon, np.float64) - np.asarray(a64.lon))
    assert dlon.max() < 1e-3
    dm = np.abs(np.asarray(a.q["m"], np.float64)
                / np.asarray(a64.q["m"]) - 1)
    assert dm.max() < 1e-5
