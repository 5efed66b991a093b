"""Tool-layer tests: CLI conventions, atm tools, met tools, binary
container round-trip (the reference's cli_test / atm_test /
compress_test analogs)."""

import importlib
import io
import os
import sys

import numpy as np
import pytest

TOOLS = ["trac", "atm_init", "atm_split", "atm_conv", "atm_select",
         "atm_stat", "atm_dist", "atm2grid", "wind", "met_map",
         "met_prof", "met_zm", "met_sample", "met_conv", "time2jsec",
         "jsec2time", "day2doy", "doy2day", "tnat", "sedi", "cape",
         "tropo", "tropo_sample", "tropo_zm", "tropo_clim", "met_lapse",
         "met_subgrid", "met_check_dt", "met_spec"]


@pytest.mark.parametrize("tool", TOOLS)
def test_cli_conventions(tool, capsys):
    """Every tool fails without args and succeeds with -h (reference
    tests/cli_test/run.sh)."""
    mod = importlib.import_module(f"mptrac_tpu.tools.{tool}")
    from mptrac_tpu.tools._cli import run_tool
    rc = run_tool(mod.main, [tool])
    assert rc not in (0, None)
    rc = run_tool(mod.main, [tool, "-h"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Usage" in out or "usage" in out


def test_calendar_tools(capsys):
    from mptrac_tpu.tools import day2doy, doy2day, jsec2time, time2jsec
    from mptrac_tpu.tools._cli import run_tool
    run_tool(time2jsec.main,
             ["t", "2011", "6", "5", "0", "0", "0", "0"])
    t = float(capsys.readouterr().out)
    run_tool(jsec2time.main, ["j", str(t)])
    assert capsys.readouterr().out.split()[:3] == ["2011", "6", "5"]
    run_tool(day2doy.main, ["d", "2011", "6", "5"])
    assert capsys.readouterr().out.strip() == "156"
    run_tool(doy2day.main, ["d", "2011", "156"])
    assert capsys.readouterr().out.split() == ["6", "5"]


def test_atm_init_split_roundtrip(tmp_path):
    from mptrac_tpu.tools import atm_conv, atm_init, atm_split
    from mptrac_tpu.tools._cli import run_tool
    ctl = tmp_path / "c.ctl"
    ctl.write_text("NQ = 2\nQNT_NAME[0] = m\nQNT_NAME[1] = idx\n"
                   "METBASE = -\nT_STOP = 86400\n")
    init = tmp_path / "init.tab"
    rc = run_tool(atm_init.main, [
        "atm_init", str(ctl), str(init),
        "INIT_T0", "0", "INIT_T1", "0", "INIT_Z0", "10", "INIT_Z1", "10",
        "INIT_LON0", "-72", "INIT_LON1", "-72",
        "INIT_LAT0", "-40", "INIT_LAT1", "-40", "INIT_MASS", "1e9"])
    assert rc == 0
    rows = np.loadtxt(init)
    assert rows.ndim == 1 and rows[2] == -72 and rows[3] == -40

    split = tmp_path / "split.tab"
    rc = run_tool(atm_split.main, [
        "atm_split", str(ctl), str(init), str(split),
        "SPLIT_N", "500", "SPLIT_M", "1e9", "SPLIT_DX", "30",
        "SPLIT_DZ", "1", "SPLIT_SEED", "42"])
    assert rc == 0
    rows = np.loadtxt(split)
    assert rows.shape[0] == 500
    # mass conserved in total
    np.testing.assert_allclose(rows[:, 4].sum(), 1e9, rtol=1e-9)
    # positions scattered around the source:
    # sigma = dx2deg(30 km, -40deg) / 2.3548 ~ 0.15 deg
    assert 0.1 < np.std(rows[:, 2]) < 0.25
    assert 0.35 < np.std(rows[:, 1]) < 0.55   # 1 km FWHM vertical

    # ASCII -> binary -> ASCII round trip (reference atm_test)
    binf = tmp_path / "split.bin"
    asc2 = tmp_path / "split2.tab"
    run_tool(atm_conv.main, ["atm_conv", str(ctl), str(split), "0",
                             str(binf), "1"])
    run_tool(atm_conv.main, ["atm_conv", str(ctl), str(binf), "1",
                             str(asc2), "0"])
    rows2 = np.loadtxt(asc2)
    np.testing.assert_allclose(rows2[:, :4], rows[:, :4], rtol=1e-6)


def test_wind_tool_and_met_roundtrip(tmp_path):
    """wind generates a met file that read_met can ingest; binary
    container round-trips through met_conv (compress_test analog)."""
    from mptrac_tpu import read_ctl
    from mptrac_tpu.met.build import read_met
    from mptrac_tpu.tools import met_conv, wind
    from mptrac_tpu.tools._cli import run_tool
    ctl_file = tmp_path / "c.ctl"
    ctl_file.write_text("NQ = 0\nMETBASE = -\nT_STOP = 86400\n")
    rc = run_tool(wind.main, [
        "wind", str(ctl_file), str(tmp_path / "wind"),
        "WIND_NX", "36", "WIND_NY", "19", "WIND_NZ", "8"])
    assert rc == 0
    metfile = tmp_path / "wind_2000_01_01_00.nc"
    assert metfile.exists()

    ctl = read_ctl(str(ctl_file), ["MET_TROPO", "0", "MET_CAPE", "0",
                                   "MET_PBL", "3"])
    met = read_met(str(metfile), ctl)
    u = np.asarray(met.fields3d["u"])
    # solid-body: u = u0 cos(lat); at equator ~38.59
    iy_eq = np.argmin(np.abs(np.asarray(met.lat)))
    assert abs(u[5, iy_eq, 3] - 38.5876) < 0.01

    # binary round trip (raw + pck + lz4)
    for met_type, tol in ((1, 0.0), (2, 1e-3), (8, 0.0)):
        binf = tmp_path / f"wind.t{met_type}.bin"
        run_tool(met_conv.main, [
            "met_conv", str(ctl_file), str(metfile), "0", str(binf),
            str(met_type), "MET_TROPO", "0", "MET_CAPE", "0"])
        ctl_bin = read_ctl(str(ctl_file), ["MET_TYPE", str(met_type)])
        met2 = read_met(str(binf), ctl_bin)
        u2 = np.asarray(met2.fields3d["u"])
        # binary stores the preprocessed grid (with wrap column)
        np.testing.assert_allclose(u2, u, atol=max(tol * 40, 1e-6))




def test_lossy_codecs_roundtrip(tmp_path):
    """SZ3-style (7) and CMS multiscale (5) codecs: compress_test
    analog — error bounds hold, streams actually compress, and the
    per-level lossy rescale machinery round-trips (reference
    compress_sz3 c:1261, compress_cms c:468, scale-to-unit c:811)."""
    from mptrac_tpu import read_ctl
    from mptrac_tpu.met import lossy
    from mptrac_tpu.met.bin_io import read_met_bin, write_met_bin
    from mptrac_tpu.met.synthetic import make_wind_met

    met = make_wind_met(nx=36, ny=19, nz=8)
    for met_type, scale in ((7, 0), (7, 1), (5, 0), (5, 1), (3, 0),
                            (3, 1)):
        args = ["NQ", "0", "METBASE", "-", "MET_TYPE", str(met_type),
                "T_STOP", "1", "MET_LOSSY_SCALE", str(scale)]
        ctl = read_ctl(None, args)
        binf = tmp_path / f"m{met_type}_{scale}.bin"
        write_met_bin(str(binf), met, met_type=met_type, ctl=ctl)
        raw = read_met_bin(str(binf), ctl)
        for name in ("t", "u", "w"):
            a = np.asarray(met.fields3d[name], np.float64)
            b = np.asarray(raw["fields3d"][name], np.float64)
            rng = max(a.max() - a.min(), 1e-30)
            mv = lossy.metvar_index(name)
            if met_type == 7:
                # |err| <= step; prec mode step = range * 2^-prec
                bound = rng * 0.5 ** ctl.met_sz3_prec[mv]
            elif met_type == 3:
                # block scale <= 2*|max|; Haar gain <= 2 per axis
                mag = max(abs(a).max(), 1e-30)
                bound = 16.0 * mag * 0.5 ** ctl.met_zfp_prec[mv]
            else:
                # Haar thresholding: err ~ eps*range per level
                bound = rng * ctl.met_cms_eps[mv] \
                    * (ctl.met_cms_maxlev + 1)
            assert np.abs(b - a).max() <= bound * 1.001, (
                met_type, scale, name)
        # compresses vs raw f32 container
        raw_size = (tmp_path / "wind.t1.bin")
        assert binf.stat().st_size < 4 * 36 * 19 * 8 * 13

    # tolerance mode: absolute bound
    tolargs = ["NQ", "0", "METBASE", "-", "MET_TYPE", "7",
               "T_STOP", "1"]
    for i in range(13):
        tolargs += [f"MET_SZ3_PREC[{i}]", "0",
                    f"MET_SZ3_TOL[{i}]", "0.05"]
    ctl = read_ctl(None, tolargs)
    binf = tmp_path / "mtol.bin"
    write_met_bin(str(binf), met, met_type=7, ctl=ctl)
    raw = read_met_bin(str(binf), ctl)
    a = np.asarray(met.fields3d["t"], np.float64)
    b = np.asarray(raw["fields3d"]["t"], np.float64)
    assert np.abs(b - a).max() <= 0.05 * 1.001
    # misconfiguration: both prec and tol set
    bad = read_ctl(None, ["NQ", "0", "METBASE", "-", "MET_TYPE", "7",
                          "T_STOP", "1", "MET_SZ3_TOL[1]", "0.05"])
    with pytest.raises(ValueError, match="Exactly one"):
        write_met_bin(str(tmp_path / "bad.bin"), met, met_type=7,
                      ctl=bad)


def test_atm_stat(tmp_path):
    from mptrac_tpu.tools import atm_stat
    from mptrac_tpu.tools._cli import run_tool
    ctl = tmp_path / "c.ctl"
    ctl.write_text("NQ = 0\nMETBASE = -\nT_STOP = 86400\n")
    atmf = tmp_path / "atm_2011_06_05_00_00_00.tab"
    atmf.write_text("0.0 10.0 -72.0 -40.0\n0.0 12.0 -70.0 -42.0\n")
    out = tmp_path / "stat.tab"
    rc = run_tool(atm_stat.main, ["atm_stat", str(ctl), str(out),
                                  "mean", str(atmf)])
    assert rc == 0
    rows = np.loadtxt(out)
    assert rows[2] == pytest.approx(11.0)     # mean z
    assert rows[3] == pytest.approx(-71.0)    # mean lon
    assert int(rows[-1]) == 2


def test_atm_nc_clams_roundtrip(tmp_path):
    """ASCII -> netCDF -> CLaMS -> ASCII round trip (interoper_test
    analog)."""
    from mptrac_tpu.tools import atm_conv
    from mptrac_tpu.tools._cli import run_tool
    ctl = tmp_path / "c.ctl"
    ctl.write_text("NQ = 1\nQNT_NAME[0] = m\nMETBASE = -\nT_STOP = 1\n")
    asc = tmp_path / "a.tab"
    asc.write_text("0.0 10.0 -72.0 -40.0 5.0\n0.0 12.0 -70.0 -42.0 7.0\n")
    ncf = tmp_path / "a.nc"
    clams = tmp_path / "a_clams.nc"
    asc2 = tmp_path / "a2.tab"
    run_tool(atm_conv.main, ["atm_conv", str(ctl), str(asc), "0",
                             str(ncf), "2"])
    run_tool(atm_conv.main, ["atm_conv", str(ctl), str(ncf), "2",
                             str(clams), "4"])
    run_tool(atm_conv.main, ["atm_conv", str(ctl), str(clams), "4",
                             str(asc2), "0"])
    a = np.loadtxt(asc)
    b = np.loadtxt(asc2)
    np.testing.assert_allclose(b, a, rtol=1e-12)


def test_native_metloader(tmp_path):
    """Native C++ async loader decodes the binary container
    identically to the Python reader."""
    pytest.importorskip("ctypes")
    from mptrac_tpu.native_loader import AsyncMetLoader, get_library
    if get_library() is None:
        pytest.skip("native library not built")
    from mptrac_tpu import read_ctl
    from mptrac_tpu.met.synthetic import make_wind_met
    from mptrac_tpu.met.bin_io import read_met_bin, write_met_bin
    met = make_wind_met(nx=36, ny=19, nz=8)
    for met_type in (1, 2):
        binf = tmp_path / f"m{met_type}.bin"
        write_met_bin(str(binf), met, met_type=met_type)
        loader = AsyncMetLoader()
        loader.prefetch(str(binf), met_type)
        raw = loader.wait()
        loader.close()
        ctl = read_ctl(None, ["NQ", "0", "METBASE", "-",
                              "MET_TYPE", str(met_type), "T_STOP", "1"])
        ref = read_met_bin(str(binf), ctl)
        np.testing.assert_array_equal(raw["lon"], ref["lon"])
        np.testing.assert_array_equal(raw["fields3d"]["u"],
                                      ref["fields3d"]["u"])
        np.testing.assert_array_equal(raw["fields2d"]["ps"],
                                      ref["fields2d"]["ps"])
