"""Output subsystem tests: grid/ens/station/vtk/sample/csi writers."""

import math
import os

import jax.numpy as jnp
import numpy as np
import pytest

from mptrac_tpu import read_ctl
from mptrac_tpu.types import Atm


def make_atm(ctl, lon, lat, p, t=0.0):
    n = len(lon)
    atm = Atm.zeros(n, ctl.qnt_name)
    return atm.replace(
        time=jnp.full(n, t, jnp.float64),
        lon=jnp.asarray(lon, jnp.float64),
        lat=jnp.asarray(lat, jnp.float64),
        p=jnp.asarray(p, jnp.float64),
        np=jnp.asarray(n, jnp.int32))


def test_grid_writer(tmp_path):
    from mptrac_tpu.io.writers import GridWriter
    ctl = read_ctl(None, [
        "NQ", "1", "QNT_NAME[0]", "m", "METBASE", "-", "SPECIES", "SO2",
        "GRID_BASENAME", "grid", "GRID_NX", "18", "GRID_NY", "9",
        "GRID_NZ", "4", "T_STOP", "600"]).replace(t_start=0.0, t_stop=600.0)
    atm = make_atm(ctl, [10.0, 10.5, -50.0], [40.0, 40.2, -30.0],
                   [500.0, 510.0, 800.0])
    atm.q["m"] = jnp.asarray([1.0, 2.0, 4.0])
    w = GridWriter(ctl)
    fn = tmp_path / "grid.tab"
    w.write(str(fn), None, atm, 0.0)
    lines = [l for l in fn.read_text().splitlines()
             if l and not l.startswith("#")]
    rows = np.array([[float(x) for x in l.split()] for l in lines])
    # every grid cell written; total particle count = 3
    assert rows.shape[0] == 18 * 9 * 4
    assert rows[:, 8].sum() == 3
    # cells with particles have column density > 0
    filled = rows[rows[:, 8] > 0]
    assert (filled[:, 6] > 0).all()
    # mass mean of the 2-particle cell is 1.5
    two = filled[filled[:, 8] == 2]
    assert two.shape[0] == 1 and two[0, 9] == pytest.approx(1.5)


def test_grid_writer_nc(tmp_path):
    """GRID_TYPE 1 netCDF variant (reference write_grid_nc,
    c:13540-13663): same binning as ASCII, (time,z,lat,lon) layout."""
    from scipy.io import netcdf_file

    from mptrac_tpu.io.writers import GridWriter
    ctl = read_ctl(None, [
        "NQ", "1", "QNT_NAME[0]", "m", "METBASE", "-", "SPECIES", "SO2",
        "GRID_BASENAME", "grid", "GRID_NX", "18", "GRID_NY", "9",
        "GRID_NZ", "4", "GRID_TYPE", "1", "GRID_STDDEV", "1",
        "T_STOP", "600"]).replace(t_start=0.0, t_stop=600.0)
    atm = make_atm(ctl, [10.0, 10.5, -50.0], [40.0, 40.2, -30.0],
                   [500.0, 510.0, 800.0])
    atm.q["m"] = jnp.asarray([1.0, 2.0, 4.0])
    fn = tmp_path / "grid.nc"
    GridWriter(ctl).write(str(fn), None, atm, 0.0)
    nc = netcdf_file(str(fn), "r")
    assert nc.variables["np"].shape == (1, 4, 9, 18)
    cnt = nc.variables["np"][:]
    assert cnt.sum() == 3
    mean = nc.variables["m_mean"][:]
    assert np.nanmax(mean[cnt > 0]) > 0
    # the 2-particle cell mean mass is 1.5 in (z,lat,lon) order
    zi, yi, xi = [a[0] for a in np.where(cnt[0] == 2)]
    assert mean[0, zi, yi, xi] == pytest.approx(1.5)
    sig = nc.variables["m_stddev"][:]
    assert sig[0, zi, yi, xi] == pytest.approx(0.5)
    assert float(nc.variables["dz"][0]) > 0
    nc.close()


def test_station_writer(tmp_path):
    from mptrac_tpu.io.writers import StationWriter
    ctl = read_ctl(None, [
        "NQ", "1", "QNT_NAME[0]", "stat", "METBASE", "-",
        "STAT_BASENAME", "stat", "STAT_LON", "10", "STAT_LAT", "40",
        "STAT_R", "100", "T_STOP", "600"]).replace(t_start=0.0,
                                                   t_stop=600.0)
    atm = make_atm(ctl, [10.1, 100.0], [40.1, 0.0], [500.0, 500.0])
    w = StationWriter(ctl, str(tmp_path / "stat.tab"))
    w.write(atm, 0.0)
    w.close()
    lines = [l for l in (tmp_path / "stat.tab").read_text().splitlines()
             if l and not l.startswith("#")]
    assert len(lines) == 1            # only the nearby parcel
    assert float(lines[0].split()[2]) == pytest.approx(10.1)
    # station flag set on the parcel
    assert np.asarray(atm.q["stat"])[0] == 1


def test_vtk_writer(tmp_path):
    from mptrac_tpu.io.writers import VtkWriter
    ctl = read_ctl(None, ["NQ", "1", "QNT_NAME[0]", "m", "METBASE", "-",
                          "VTK_BASENAME", "vtk", "T_STOP", "600"]
                   ).replace(t_start=0.0, t_stop=600.0)
    atm = make_atm(ctl, [0.0, 10.0], [0.0, 20.0], [500.0, 300.0])
    atm.q["m"] = jnp.asarray([1.0, 2.0])
    w = VtkWriter(ctl)
    fn = tmp_path / "out.vtk"
    w.write(str(fn), atm, 0.0)
    text = fn.read_text()
    assert "POINTS 2 float" in text
    assert "SCALARS m float 1" in text


def test_ens_writer(tmp_path):
    from mptrac_tpu.io.writers import EnsWriter
    ctl = read_ctl(None, [
        "NQ", "2", "QNT_NAME[0]", "ens", "QNT_NAME[1]", "m",
        "METBASE", "-", "NENS", "2", "ENS_BASENAME", "ens",
        "T_STOP", "600"]).replace(t_start=0.0, t_stop=600.0)
    atm = make_atm(ctl, [0.0, 1.0, 2.0, 3.0], [0.0, 0.0, 10.0, 10.0],
                   [500.0] * 4)
    atm.q["ens"] = jnp.asarray([0.0, 0.0, 1.0, 1.0])
    atm.q["m"] = jnp.asarray([1.0, 3.0, 5.0, 7.0])
    w = EnsWriter(ctl)
    fn = tmp_path / "ens.tab"
    w.write(str(fn), atm, 0.0)
    lines = [l for l in fn.read_text().splitlines()
             if l and not l.startswith("#")]
    assert len(lines) == 2
    r0 = lines[0].split()
    assert float(r0[5]) == pytest.approx(2.0)   # mean mass of ens 0
    assert int(r0[-1]) == 2                      # two members


def test_sample_and_csi_writers(tmp_path):
    obsfile = tmp_path / "obs.tab"
    # one observation at t=0, z=5.5km, (10E, 40N), value 1.0
    obsfile.write_text("0.0 5.5 10.0 40.0 1.0\n")
    ctl = read_ctl(None, [
        "NQ", "1", "QNT_NAME[0]", "m", "METBASE", "-", "SPECIES", "SO2",
        "SAMPLE_BASENAME", "sample", "SAMPLE_OBSFILE", str(obsfile),
        "SAMPLE_DX", "100", "CSI_BASENAME", "csi",
        "CSI_OBSFILE", str(obsfile), "CSI_OBSMIN", "0.5",
        "CSI_MODMIN", "1e-30", "CSI_DT_OUT", "600",
        "T_STOP", "600"]).replace(t_start=0.0, t_stop=600.0)
    atm = make_atm(ctl, [10.05, 30.0], [40.05, 0.0], [500.0, 500.0])
    atm.q["m"] = jnp.asarray([2.0, 5.0])

    from mptrac_tpu.io.writers import CsiWriter, SampleWriter
    sw = SampleWriter(ctl, str(tmp_path / "sample.tab"))
    sw.write(None, atm, 0.0)
    sw.close()
    lines = [l for l in (tmp_path / "sample.tab").read_text().splitlines()
             if l and not l.startswith("#")]
    assert len(lines) == 1
    toks = lines[0].split()
    assert int(toks[6]) == 1          # one parcel in radius
    assert float(toks[7]) > 0         # column density

    cw = CsiWriter(ctl, str(tmp_path / "csi.tab"))
    cw.write(atm, 0.0)
    cw.close()
    lines = [l for l in (tmp_path / "csi.tab").read_text().splitlines()
             if l and not l.startswith("#")]
    assert len(lines) == 1
    toks = lines[0].split()
    assert int(toks[2]) == 1          # one hit (obs>=min, mod>=min)


def test_full_run_with_outputs(tmp_path, era5_utm_fixture):
    """End-to-end run writing atm+grid+vtk outputs."""
    from mptrac_tpu.sim import run_trac
    from mptrac_tpu.timeutil import time2jsec
    data = tmp_path / "data"
    data.mkdir()
    t1 = time2jsec(2025, 5, 1, 1)
    (data / "trac.ctl").write_text(f"""NQ = 1
QNT_NAME[0] = t
METBASE = /root/reference/tests/data/era5_utm32
DIFFUSION = 0
DT_MET = 3600.0
T_STOP = {t1}
""")
    (data / "atm.tab").write_text(
        "799372800.0 2.0 691090 5336247\n799372800.0 5.0 650000 5200000\n")
    sim = run_trac(str(data), "trac.ctl", "atm.tab",
                   ["ATM_BASENAME", "atm_out", "MET_CAPE", "0",
                    "DT_MOD", "1200", "ATM_DT_OUT", "1200",
                    "VTK_BASENAME", "vtk", "VTK_DT_OUT", "1200",
                    "MET_COORD_TYPE", "1",
                    "MET_UTM_REF_LON", "11.5692782",
                    "MET_UTM_REF_LAT", "48.1507476"])
    tabs = sorted(data.glob("atm_out_*.tab"))
    vtks = sorted(data.glob("vtk_*.vtk"))
    assert len(tabs) == 4 and len(vtks) == 4
    assert "POINTS 2 float" in vtks[-1].read_text()


def test_atm_gnuplot_pipe(tmp_path, monkeypatch):
    """ATM_GPFILE pipes the particle table into gnuplot with the
    reference prelude (write_atm_asc, c:12462-12486)."""
    fake_bin = tmp_path / "bin"
    fake_bin.mkdir()
    cap = tmp_path / "captured.gp"
    (fake_bin / "gnuplot").write_text(
        f"#!/bin/sh\ncat > {cap}\n")
    os.chmod(fake_bin / "gnuplot", 0o755)
    monkeypatch.setenv("PATH",
                       f"{fake_bin}:{os.environ.get('PATH', '')}")

    gp = tmp_path / "plot.gp"
    gp.write_text("plot '-' w points\n")
    ctl = read_ctl(None, ["NQ", "0", "METBASE", "-", "T_STOP", "3600",
                          "ATM_GPFILE", str(gp)])
    atm = make_atm(ctl, [10.0, 20.0], [0.0, 5.0], [500.0, 600.0])
    from mptrac_tpu.io.atm_io import write_atm_asc
    write_atm_asc(str(tmp_path / "atm_x.tab"), ctl, atm, 0.0)
    text = cap.read_text()
    assert 'set out "' in text and 'atm_x.tab.png"' in text
    assert 'timestr="2000-01-01, 00:00 UTC"' in text
    assert "plot '-' w points" in text
    assert "10 0" in text            # data rows follow the script


def test_atm_gnuplot_missing_binary(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path))   # no gnuplot anywhere
    gp = tmp_path / "plot.gp"
    gp.write_text("plot '-'\n")
    ctl = read_ctl(None, ["NQ", "0", "METBASE", "-", "T_STOP", "3600",
                          "ATM_GPFILE", str(gp)])
    atm = make_atm(ctl, [10.0], [0.0], [500.0])
    from mptrac_tpu.io.atm_io import write_atm_asc
    with pytest.raises(RuntimeError, match="pipe to gnuplot"):
        write_atm_asc(str(tmp_path / "atm_x.tab"), ctl, atm, 0.0)
