"""Met ingest + preprocessing tests on the era5_utm32 fixture."""

import numpy as np
import pytest

from mptrac_tpu import read_ctl
from mptrac_tpu.met.build import read_met
from mptrac_tpu.met.read_nc import get_met_filename, time_from_filename
from mptrac_tpu.timeutil import time2jsec


@pytest.fixture(scope="module")
def utm_ctl():
    return read_ctl(None, [
        "NQ", "0", "MET_COORD_TYPE", "1",
        "MET_UTM_REF_LON", "11.5692782", "MET_UTM_REF_LAT", "48.1507476",
        "MET_CAPE", "0", "METBASE",
        "/root/reference/tests/data/era5_utm32"])


@pytest.fixture(scope="module")
def met0(utm_ctl, era5_utm_fixture):
    return read_met(str(era5_utm_fixture), utm_ctl)


def test_time_from_filename():
    t = time_from_filename("/x/era5_utm32_2025_05_01_02.nc")
    assert t == time2jsec(2025, 5, 1, 2)


def test_met_filename_templating(utm_ctl):
    t = time2jsec(2025, 5, 1, 0, 30)
    # direct=+1 rounds up to the next met step, -1 rounds down
    assert get_met_filename(utm_ctl, t, 1).endswith(
        "era5_utm32_2025_05_01_01.nc")
    assert get_met_filename(utm_ctl, t, -1).endswith(
        "era5_utm32_2025_05_01_00.nc")


def test_met_grid(met0):
    assert (met0.nx, met0.ny, met0.npl) == (17, 30, 37)
    p = np.asarray(met0.p)
    assert p[0] == 1000.0 and p[-1] == 1.0          # descending hPa
    assert np.asarray(met0.lon)[0] == 420000.0       # UTM meters


def test_met_fields_physical(met0):
    f2 = {k: np.asarray(v) for k, v in met0.fields2d.items()}
    f3 = {k: np.asarray(v) for k, v in met0.fields3d.items()}
    # Surface pressure in hPa, plausible range
    assert 700 < np.nanmin(f2["ps"]) < np.nanmax(f2["ps"]) < 1050
    # Tropopause (WMO 1st) between 100 and 400 hPa at midlatitudes
    assert 100 < np.nanmin(f2["pt"]) and np.nanmax(f2["pt"]) < 400
    # Tropopause height ~8-15 km
    assert 8 < np.nanmin(f2["zt"]) < np.nanmax(f2["zt"]) < 16
    # PBL pressure below (larger than) 700 hPa
    assert np.nanmin(f2["pbl"]) > 700
    # geopotential heights increase with level (descending p)
    z = f3["z"]
    col = z[5, 5]
    assert np.all(np.diff(col) > 0)
    # total ozone column plausible (Dobson)
    assert 150 < np.nanmax(f2["o3c"]) < 600
    # water vapor converted to ppv (values > kg/kg input)
    assert np.nanmax(f3["h2o"]) > 1e-3


def test_met_extrapolate_fills_columns(met0):
    # columns that have any valid data must be fully finite after
    # extrapolation
    t = np.asarray(met0.fields3d["t"])
    col_valid = np.isfinite(t).any(axis=-1)
    assert np.isfinite(t[col_valid]).all()


def test_cape_computation(era5_utm_fixture):
    ctl = read_ctl(None, [
        "NQ", "0", "MET_COORD_TYPE", "1",
        "MET_UTM_REF_LON", "11.5692782", "MET_UTM_REF_LAT", "48.1507476",
        "MET_CAPE", "1", "METBASE", "x"])
    met = read_met(str(era5_utm_fixture), ctl)
    cape = np.asarray(met.fields2d["cape"])
    plcl = np.asarray(met.fields2d["plcl"])
    ok = np.isfinite(cape)
    assert ok.sum() > 100           # most columns computed
    assert np.nanmax(cape) < 5000   # J/kg, sane bound
    assert np.nanmin(cape) >= 0
    # LCL below 500 hPa level (i.e. pressure > 500)
    assert np.nanmin(plcl) > 400


def test_downsampling(utm_ctl, era5_utm_fixture):
    ctl = utm_ctl.replace(met_dx=2, met_dy=2, met_dp=2, met_sx=2,
                          met_sy=2, met_sp=1)
    met = read_met(str(era5_utm_fixture), ctl)
    assert (met.nx, met.ny, met.npl) == (9, 15, 19)
    # smoothed fields stay physical
    t = np.asarray(met.fields3d["t"])
    assert 180 < np.nanmin(t) < np.nanmax(t) < 330


def test_detrend(era5_utm_fixture):
    ctl = read_ctl(None, [
        "NQ", "0", "MET_COORD_TYPE", "0", "MET_CAPE", "0",
        "MET_TROPO", "0", "MET_PBL", "3", "METBASE", "x",
        "MET_DETREND", "500"])
    from mptrac_tpu.met.synthetic import make_wind_met
    from mptrac_tpu.met import process
    met = make_wind_met(nx=72, ny=37, nz=8)
    lon = np.asarray(met.lon)
    lat = np.asarray(met.lat)
    p = np.asarray(met.p)
    f3 = {k: np.asarray(v).copy() for k, v in met.fields3d.items()}
    u_before = f3["u"].copy()
    process.detrend(ctl, lon, lat, p, f3)
    # solid-body u is smooth at 500 km scale: detrending removes most
    assert np.abs(f3["u"]).max() < 0.2 * np.abs(u_before).max()


def test_level_definitions():
    from mptrac_tpu.met.process import level_definitions
    p147 = level_definitions(3)
    assert p147.size == 147
    assert p147[0] > p147[-1]          # descending (surface first)
    assert p147[0] == 1044.45
    with pytest.raises(ValueError):
        level_definitions(0)


def test_monotonize():
    from mptrac_tpu.met.process import monotonize
    ctl = read_ctl(None, ["NQ", "0", "METBASE", "x",
                          "ADVECT_VERT_COORD", "1", "T_STOP", "1"])
    hybrid = np.arange(6, dtype=float)
    zet = np.array([300.0, 320.0, 310.0, 315.0, 340.0, 360.0])
    f3 = {"zetal": np.broadcast_to(zet, (2, 2, 6)).copy().astype(
        np.float32)}
    monotonize(ctl, hybrid, f3)
    out = f3["zetal"][0, 0]
    assert (np.diff(out) > 0).all()
    # untouched outside the inversion
    assert out[0] == 300.0 and out[1] == 320.0 and out[-1] == 360.0


def test_grib1_reader(reference_dir):
    """Pure-Python GRIB1 decode of the reference grib fixture
    (grib_test analog: surface fields decode with physical values)."""
    grib = reference_dir / "tests" / "grib_test" / "gribdata" / \
        "gb_2011060600_small_sf.grb"
    if not grib.exists():
        pytest.skip("grib fixture missing")
    from mptrac_tpu.io.grib1 import decode_file
    recs = decode_file(str(grib))
    assert len(recs) == 33
    by_param = {r.param: r for r in recs}
    # surface pressure 750-1020 hPa over the Alps domain
    sp = by_param[134].values
    assert 70000 < np.nanmin(sp) < np.nanmax(sp) < 103000
    # 2m temperature physical
    t2m = by_param[167].values
    assert 250 < np.nanmin(t2m) < np.nanmax(t2m) < 320
    # land-sea mask within [0, 1]
    lsm = by_param[172].values
    assert np.nanmin(lsm) >= 0 and np.nanmax(lsm) <= 1
    assert by_param[134].year == 2011 and by_param[134].mon == 6


def test_grib2_roundtrip(tmp_path):
    """GRIB2 encode -> decode round trip (templates 3.0/4.0/5.0,
    simple packing; reference ecCodes path c:10467-10907)."""
    from mptrac_tpu.io import grib2
    rng = np.random.default_rng(3)
    ny, nx = 19, 36
    lon = np.linspace(0, 350, nx)
    lat = np.linspace(-90, 90, ny)
    vals = 250.0 + 30.0 * rng.random((ny, nx))
    msg = grib2.encode_message(130, 500, vals, lon, lat,
                               when=(2011, 6, 6, 0, 0),
                               level_type=100)
    f = tmp_path / "t.grb2"
    f.write_bytes(msg + grib2.encode_message(
        134, 0, 90000.0 + 5000.0 * rng.random((ny, nx)), lon, lat,
        when=(2011, 6, 6, 0, 0), level_type=1))
    recs = grib2.decode_file(str(f))
    assert len(recs) == 2
    r = recs[0]
    assert (r.param, r.level_type, r.level) == (130, 100, 500)
    assert (r.year, r.mon, r.day) == (2011, 6, 6)
    assert r.nx == nx and r.ny == ny
    assert abs(r.lon0 - lon[0]) < 1e-5 and abs(r.lat1 - lat[-1]) < 1e-5
    # 16-bit simple packing: relative error ~ range/2^16
    np.testing.assert_allclose(r.values, vals, atol=30.0 / 60000)
    # edition-agnostic entry point dispatches too
    from mptrac_tpu.io.grib1 import decode_file
    assert len(decode_file(str(f))) == 2


def test_read_met_grib2_ml(tmp_path):
    """Full met ingest from generated GRIB2 ml+sf companion files —
    the ml-grib coverage the reference grib_test exercises with
    ecCodes fixtures (run.sh)."""
    from mptrac_tpu.io import grib2
    ny, nx = 19, 36
    lon = np.linspace(0, 350, nx)
    lat = np.linspace(-90, 90, ny)
    levels = [850, 500, 200]
    when = (2011, 6, 5, 0, 0)
    lat2 = lat[:, None] * np.pi / 180.0
    ml = b""
    for lev in levels:
        t = 220.0 + 60.0 * np.cos(lat2) * np.ones((ny, nx)) \
            * (lev / 1000.0)
        u = 40.0 * np.cos(lat2) * np.ones((ny, nx))
        v = np.zeros((ny, nx)) + 1.0
        for code, vals in ((130, t), (131, u), (132, v)):
            ml += grib2.encode_message(code, lev, vals, lon, lat,
                                       when=when, level_type=100)
    sf = grib2.encode_message(
        134, 0, np.full((ny, nx), 101325.0), lon, lat, when=when,
        level_type=1)
    (tmp_path / "gb_2011060500_ml.grb").write_bytes(ml)
    (tmp_path / "gb_2011060500_sf.grb").write_bytes(sf)

    from mptrac_tpu.met.read_grib import read_met_grib
    ctl = read_ctl(None, ["NQ", "0", "METBASE", "-", "MET_TYPE", "6",
                          "T_STOP", "1"])
    raw = read_met_grib(str(tmp_path / "gb_2011060500_XX.grb"), ctl)
    assert list(raw["p"]) == [850.0, 500.0, 200.0]
    assert raw["fields3d"]["t"].shape == (nx, ny, 3)
    # equator t at 850 hPa = 220 + 60*0.85 = 271
    iy = np.argmin(np.abs(raw["lat"]))
    assert abs(raw["fields3d"]["t"][5, iy, 0] - 271.0) < 0.5
    assert abs(raw["fields2d"]["ps"][0, 0] - 1013.25) < 0.1
    assert abs(raw["fields3d"]["u"][3, iy, 1] - 40.0) < 0.1


def test_read_met_grib(reference_dir):
    from mptrac_tpu.met.read_grib import read_met_grib
    base = str(reference_dir / "tests" / "grib_test" / "gribdata"
               / "gb_2011060600_small_XX.grb")
    # only the sf file exists; ml falls back to the same list
    import os
    ctl = read_ctl(None, ["NQ", "0", "METBASE", "-", "MET_TYPE", "6",
                          "T_STOP", "1"])
    try:
        raw = read_met_grib(base, ctl)
    except FileNotFoundError:
        pytest.skip("ml grib file not available")
    assert raw["fields2d"]["ps"].max() < 1100
