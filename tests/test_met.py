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
