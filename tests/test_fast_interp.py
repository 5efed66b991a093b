"""Packed fast-path advection must match the exact path to float32
interpolation tolerance."""

import jax
import jax.numpy as jnp
import numpy as np

from mptrac_tpu import read_ctl, stack_met
from mptrac_tpu.climatology import read_clim
from mptrac_tpu.met.synthetic import make_wind_met
from mptrac_tpu.ops.fast_interp import build_advect_pack
from mptrac_tpu.physics import pipeline
from mptrac_tpu.types import Atm, Cache


def test_fast_advect_matches_exact():
    ctl = read_ctl(None, [
        "NQ", "0", "METBASE", "-", "DIFFUSION", "0", "ADVECT", "4",
        "MET_DT_OUT", "0", "T_STOP", "86400", "DT_MOD", "1200"]
    ).replace(t_start=0.0, t_stop=36 * 1200.0)
    clim = read_clim(ctl)
    met01 = stack_met(make_wind_met(t0=0.0, alpha=30.0, nx=90, ny=46,
                                    nz=12),
                      make_wind_met(t0=86400.0, alpha=30.0, nx=90,
                                    ny=46, nz=12))
    pack = build_advect_pack(met01)

    n = 300
    rng = np.random.default_rng(11)
    atm0 = Atm.zeros(n)
    atm0 = atm0.replace(
        time=jnp.zeros(n),
        lon=jnp.asarray(rng.uniform(-180, 180, n)),
        lat=jnp.asarray(rng.uniform(-75, 75, n)),
        p=jnp.asarray(rng.uniform(200, 900, n)),
        np=jnp.asarray(n, jnp.int32))

    step_exact = jax.jit(lambda m, a, c, t: pipeline.run_timestep(
        ctl, clim, m, a, c, t))
    step_fast = jax.jit(lambda m, a, c, t: pipeline.run_timestep(
        ctl, clim, m, a, c, t, pack=pack))

    ae, af = atm0, atm0
    ce, cf = Cache.zeros(n), Cache.zeros(n)
    for i in range(1, 37):
        t = jnp.asarray(i * 1200.0)
        ae, ce = step_exact(met01, ae, ce, t)
        af, cf = step_fast(met01, af, cf, t)

    # 12 hours of advection: f32 interp noise accumulates ~1e-4 deg
    dlon = np.abs((np.asarray(af.lon) - np.asarray(ae.lon) + 180)
                  % 360 - 180)
    dlat = np.abs(np.asarray(af.lat) - np.asarray(ae.lat))
    assert dlon.max() < 5e-3
    assert dlat.max() < 5e-3
    np.testing.assert_allclose(np.asarray(af.p), np.asarray(ae.p),
                               rtol=1e-4)
