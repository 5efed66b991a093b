"""KPP full-chemistry tests: solver correctness on a known ODE and a
mechanism integration sanity check (kpp_test analog)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mptrac_tpu import read_ctl, stack_met
from mptrac_tpu.climatology import read_clim
from mptrac_tpu.met.synthetic import make_wind_met
from mptrac_tpu.physics import kpp
from mptrac_tpu.types import Atm, Cache


def test_mechanism_tables():
    assert kpp.NVAR == 15
    assert kpp.NREACT == 39
    # mass action: reaction 1 (o3p + o3 -> 2 o2) consumes one of each
    io3p = kpp.VAR_SPECIES.index("o3p")
    io3 = kpp.VAR_SPECIES.index("o3")
    assert float(kpp.REACT_V[1, io3p]) == 1.0
    assert float(kpp.REACT_V[1, io3]) == 1.0
    assert float(kpp.NET_V[1, io3p]) == -1.0
    # reaction 18: h + ho2 -> 2 oh
    ih = kpp.VAR_SPECIES.index("h")
    ioh = kpp.VAR_SPECIES.index("oh")
    assert float(kpp.NET_V[18, ioh]) == 2.0
    assert float(kpp.NET_V[18, ih]) == -1.0


def test_rosenbrock_exponential_decay():
    """With a single first-order loss the solver must reproduce
    exp(-k t) accurately."""
    c0 = jnp.zeros(kpp.NVAR).at[kpp.VAR_SPECIES.index("ccl3f")].set(1e9)
    fix = jnp.zeros(3)
    rconst = jnp.zeros(kpp.NREACT).at[35].set(1e-4)  # ccl3f + hv ->
    out = kpp.integrate(c0, fix, rconst, 3600.0)
    expected = 1e9 * np.exp(-1e-4 * 3600.0)
    got = float(out[kpp.VAR_SPECIES.index("ccl3f")])
    assert abs(got - expected) / expected < 1e-3


def test_module_kpp_chem_runs():
    ctl = read_ctl(None, [
        "NQ", "6", "QNT_NAME[0]", "m", "QNT_NAME[1]", "Cx",
        "QNT_NAME[2]", "Coh", "QNT_NAME[3]", "Cho2",
        "QNT_NAME[4]", "Ch2o2", "QNT_NAME[5]", "mloss_kpp",
        "METBASE", "-", "KPP_CHEM", "1", "DT_KPP", "600",
        "SPECIES", "SO2", "T_STOP", "3600"])
    clim = read_clim(ctl)
    assert "h2o2" in clim.photo or len(clim.photo) > 0
    met01 = stack_met(
        make_wind_met(nx=36, ny=19, nz=8, q=5e-6, o3=2e-6),
        make_wind_met(t0=86400.0, nx=36, ny=19, nz=8, q=5e-6, o3=2e-6))
    n = 16
    rng = np.random.default_rng(1)
    atm = Atm.zeros(n, ctl.qnt_name).replace(
        time=jnp.full(n, 6 * 3600.0),     # daytime
        lon=jnp.asarray(rng.uniform(-30, 30, n)),
        lat=jnp.asarray(rng.uniform(-30, 30, n)),
        p=jnp.asarray(rng.uniform(50, 300, n)),
        np=jnp.asarray(n, jnp.int32))
    atm.q["m"] = jnp.ones(n)
    atm.q["Cx"] = jnp.full(n, 1e-9)
    atm.q["Coh"] = jnp.full(n, 1e-13)
    atm.q["Cho2"] = jnp.full(n, 1e-12)
    atm.q["Ch2o2"] = jnp.full(n, 1e-10)
    cache = Cache.zeros(n).replace(dt=jnp.full(n, 600.0))

    out = jax.jit(lambda a: kpp.module_kpp_chem(ctl, cache, clim,
                                                met01, a))(atm)
    cx = np.asarray(out.q["Cx"])
    assert np.isfinite(cx).all()
    assert (cx >= 0).all()
    assert (cx <= 1e-9 + 1e-15).all()      # SO2 can only be lost
    m = np.asarray(out.q["m"])
    assert (m <= 1.0).all() and np.isfinite(m).all()
    # HOx partitioning changed (chemistry actually ran); atol=0 so the
    # comparison is relative at these 1e-13 magnitudes
    assert not np.allclose(np.asarray(out.q["Coh"]), 1e-13,
                           rtol=0.05, atol=0.0)
