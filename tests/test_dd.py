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


def test_dd_stress_3x3_diffusion():
    """dd_test-parity stress run (reference tests/dd_test/run.sh:83):
    3x3 subdomains, 10k parcels, diffusion ON, conservation +
    overflow-detection + lost-parcel accounting.  Runs in a
    subprocess with 9 virtual devices (the suite itself runs with
    8)."""
    import os
    import subprocess
    import sys
    env = dict(os.environ,
               JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=9")
    helper = os.path.join(os.path.dirname(__file__), "helpers",
                          "dd_stress_worker.py")
    r = subprocess.run([sys.executable, helper], env=env,
                       capture_output=True, text=True, timeout=900)
    assert r.returncode == 0, r.stdout + r.stderr
    assert "OK n=10000" in r.stdout, r.stdout


def test_dd_multiprocess_all_to_all(tmp_path):
    """Two jax.distributed processes (1 cpu device each) exchange
    parcels through a cross-process lax.all_to_all and read their met
    tiles as per-rank hyperslabs (reference MPI_Alltoallv c:2072 +
    dd_read_met_nc_grid c:11077)."""
    import os
    import socket
    import subprocess
    import sys

    # met files shared by both ranks
    from mptrac_tpu.met.synthetic import make_wind_met
    from mptrac_tpu.met.write_nc import write_met_nc
    for t0, name in ((0.0, "wind_2000_01_01_00.nc"),
                     (3600.0, "wind_2000_01_01_01.nc")):
        write_met_nc(str(tmp_path / name),
                     make_wind_met(t0=t0, nx=36, ny=19, nz=8),
                     drop_wrap_column=True)

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    helper = os.path.join(os.path.dirname(__file__), "helpers",
                          "dd_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS",)}
    procs = [subprocess.Popen(
        [sys.executable, helper, str(pid), "2", str(port),
         str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True) for pid in range(2)]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, out + err
        assert "OK pid=" in out, out + err


def test_read_met_tile_hyperslab(tmp_path):
    """Per-rank hyperslab met read equals slicing the global read."""
    from mptrac_tpu.met.build import read_met
    from mptrac_tpu.met.synthetic import make_wind_met
    from mptrac_tpu.met.write_nc import write_met_nc
    ctl = read_ctl(None, [
        "NQ", "0", "METBASE", "-", "MET_TROPO", "0", "MET_CAPE", "0",
        "MET_PBL", "3", "T_STOP", "1",
        "DD", "1", "DD_SUBDOMAINS_ZONAL", "2",
        "DD_SUBDOMAINS_MERIDIONAL", "2", "DD_HALOS_SIZE", "3"])
    fn = str(tmp_path / "wind_2000_01_01_00.nc")
    write_met_nc(fn, make_wind_met(nx=36, ny=19, nz=8),
                 drop_wrap_column=True)
    met_glob = read_met(fn, ctl)
    dd = ddm.plan_decomposition(ctl, met_glob, ndev=4)
    lat_glob = np.asarray(met_glob.lat)
    for rank in range(4):
        tile = ddm.read_met_tile(fn, ctl, dd, rank, lat_glob)
        xidx, yidx, lon_axis, lat_axis = ddm.tile_selection(
            dd, rank, lat_glob)
        assert np.asarray(tile.lon).shape[0] == xidx.size
        np.testing.assert_allclose(np.asarray(tile.lon), lon_axis)
        np.testing.assert_allclose(np.asarray(tile.lat), lat_axis)
        # interior (non-halo) data matches the global field exactly
        u_g = np.asarray(met_glob.fields3d["u"])
        u_t = np.asarray(tile.fields3d["u"])
        h = dd.halo
        sel_u = u_g[xidx][:, yidx]
        np.testing.assert_allclose(
            u_t[h:-h, h:-h], sel_u[h:-h, h:-h], atol=1e-5)


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
