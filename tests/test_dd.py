"""Domain decomposition: parcel migration across an 8-device mesh must
reproduce the single-device trajectories (the dd_test analog,
reference tests/dd_test: synthetic solid-body wind, subdomain grid,
particle positions compared against the non-decomposed reference)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mptrac_tpu import read_ctl, stack_met
from mptrac_tpu.climatology import read_clim
from mptrac_tpu.met.synthetic import make_wind_met
from mptrac_tpu.parallel import dd as ddm
from mptrac_tpu.physics import pipeline
from mptrac_tpu.types import Atm, Cache


@pytest.fixture(scope="module")
def setup():
    ctl = read_ctl(None, [
        "NQ", "1", "QNT_NAME[0]", "idx",
        "METBASE", "-", "DIFFUSION", "0", "ADVECT", "4",
        "DD", "1", "DD_SUBDOMAINS_ZONAL", "4",
        "DD_SUBDOMAINS_MERIDIONAL", "2", "DD_HALOS_SIZE", "4",
        "MET_DT_OUT", "0",
        "T_STOP", "86400", "DT_MOD", "1200"])
    clim = read_clim(ctl)
    # tilted solid-body flow drives both zonal and meridional migration
    met0 = make_wind_met(t0=0.0, nx=90, ny=46, nz=8, alpha=40.0)
    met1 = make_wind_met(t0=86400.0, nx=90, ny=46, nz=8, alpha=40.0)
    met01 = stack_met(met0, met1)

    n = 200
    rng = np.random.default_rng(5)
    atm = Atm.zeros(n, ctl.qnt_name)
    atm = atm.replace(
        time=jnp.zeros(n),
        lon=jnp.asarray(rng.uniform(0, 360, n)),
        lat=jnp.asarray(rng.uniform(-60, 60, n)),
        p=jnp.asarray(rng.uniform(300, 900, n)),
        np=jnp.asarray(n, jnp.int32))
    atm.q["idx"] = jnp.arange(n, dtype=jnp.float64)
    return ctl, clim, met01, atm


def test_dd_matches_single_device(setup):
    ctl, clim, met01, atm0 = setup
    nsteps = 24
    dt = ctl.dt_mod
    ctl_run = ctl.replace(t_start=0.0, t_stop=nsteps * dt)

    # --- Single-device reference run
    ctl_single = ctl_run.replace(dd=0)
    step = pipeline.make_step(ctl_single, clim)
    atm_s = atm0
    cache_s = Cache.zeros(atm0.npmax)
    for i in range(1, nsteps + 1):
        atm_s, cache_s = step(met01, atm_s, cache_s,
                              jnp.asarray(i * dt, jnp.float64))

    # --- Decomposed run on 8 virtual devices
    dd = ddm.plan_decomposition(ctl_run, jax.tree.map(
        lambda x: x[0], met01), ndev=8)
    assert dd.ndev == 8
    mesh = __import__("mptrac_tpu.parallel.mesh",
                      fromlist=["make_mesh"]).make_mesh(8, axis="sub")
    tiles = ddm.make_tiles(dd, met01)
    lat_axis = np.asarray(met01.lat[0])
    cap = 128
    atm_d, cache_d = ddm.scatter_parcels(dd, atm0, cap, lat_axis)
    dstep = ddm.make_dd_step(ctl_run, clim, dd, mesh, cap,
                             exch_cap=32, lat_axis=lat_axis)
    for i in range(1, nsteps + 1):
        atm_d, cache_d, overflow, lost = dstep(
            tiles, atm_d, cache_d, jnp.asarray(i * dt, jnp.float64))
        assert int(np.asarray(overflow).sum()) == 0

    out = ddm.gather_parcels(dd, atm_d, cap)
    n = int(atm0.np)
    assert int(out.np) == n      # nothing lost at these latitudes

    # Match by particle index and compare trajectories
    idx_s = np.asarray(atm_s.q["idx"]).astype(int)
    idx_d = np.asarray(out.q["idx"]).astype(int)
    order_s = np.argsort(idx_s)
    order_d = np.argsort(idx_d)
    lon_s = np.asarray(atm_s.lon)[order_s]
    lon_d = np.asarray(out.lon)[order_d]
    lat_s = np.asarray(atm_s.lat)[order_s]
    lat_d = np.asarray(out.lat)[order_d]
    p_s = np.asarray(atm_s.p)[order_s]
    p_d = np.asarray(out.p)[order_d]

    # Trajectories agree to interpolation tolerance: tile halo
    # clamping only differs from the global grid for parcels that
    # outran the halo within one migration interval (none here).
    dlon = np.abs((lon_d - lon_s + 180) % 360 - 180)
    np.testing.assert_allclose(lat_d, lat_s, atol=1e-9)
    assert dlon.max() < 1e-9
    np.testing.assert_allclose(p_d, p_s, atol=1e-9)


def test_owner_assignment():
    dd = ddm.DDGrid(n_zonal=4, n_merid=2, halo=2, nx_glob=91,
                    ny_glob=46, lon0=0.0, dlon=4.0, periodic=True)
    lat_axis = jnp.linspace(-90, 90, 46)
    own = dd.owner_of(jnp.asarray([0.0, 90.0, 180.0, 270.0, -90.0]),
                      jnp.asarray([-45.0, 45.0, -45.0, 45.0, 10.0]),
                      lat_axis)
    own = np.asarray(own)
    assert own[0] == 0          # lon 0, south -> (sx=0, sy=0)
    assert own[1] == 3          # lon 90 -> sx=1, north sy=1
    assert own[2] == 4          # lon 180 -> sx=2, south
    assert own[4] == 7          # lon -90 == 270 -> sx=3, north
