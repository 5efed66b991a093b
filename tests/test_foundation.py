"""Tests of constants, thermo ops, time utils and config parsing."""

import math
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from mptrac_tpu import constants, read_ctl, time2jsec, jsec2time
from mptrac_tpu.config import CtlFile
from mptrac_tpu.ops import thermo


def test_constants():
    assert constants.P0 == 1013.25
    assert constants.H0 == 7.0
    assert math.isclose(constants.RA, 1e3 * 8.3144598 / 28.9644)
    assert math.isclose(constants.EPS, 18.01528 / 28.9644)


def test_pressure_altitude_roundtrip():
    z = jnp.linspace(0.0, 60.0, 7)
    p = thermo.pressure(z)
    assert np.allclose(thermo.altitude(p), z, atol=1e-12)
    # P(0) = P0
    assert np.isclose(thermo.pressure(0.0), 1013.25)


def test_thermo_basics():
    # Saturation pressure at 0C equals 6.112 hPa (WMO 2018)
    assert np.isclose(thermo.psat(273.15), 6.112)
    assert np.isclose(thermo.psice(273.15), 6.112)
    # Density of air at standard conditions ~ 1.29 kg/m3
    assert np.isclose(thermo.rho(1013.25, 273.15), 1.2922, atol=1e-3)
    # theta at 1000 hPa equals temperature
    assert np.isclose(thermo.theta(1000.0, 250.0), 250.0)
    # dew point of saturated air equals temperature
    t = 280.0
    p = 900.0
    # invert pw to get h2o for saturation
    ps_ = thermo.psat(t)
    h2o = ps_ / (p - (1 - constants.EPS) * ps_)
    assert np.isclose(thermo.tdew(p, h2o), t, atol=1e-6)


def test_coordinate_conversions():
    # 1 degree of latitude is about 111 km
    assert np.isclose(thermo.deg2dy(1.0), 111.13, atol=0.02)
    assert np.isclose(thermo.dy2deg(thermo.deg2dy(1.0)), 1.0)
    # longitude shrinks with cos(lat)
    assert np.isclose(thermo.deg2dx(1.0, 60.0),
                      thermo.deg2dx(1.0, 0.0) * 0.5, atol=1e-6)
    # pole guard
    assert thermo.dx2deg(100.0, 90.0) == 0.0
    # dz/dp hydrostatic approximations invert
    p = 500.0
    dz = 0.1
    assert np.isclose(thermo.dp2dz(thermo.dz2dp(dz, p), p), dz)


def test_fmod_truncation():
    # C-style fmod truncates toward zero (unlike Python %)
    assert thermo.fmod(-190.0, 360.0) == -190.0
    assert thermo.fmod(370.0, 360.0) == 10.0
    assert thermo.fmod(-370.0, 360.0) == pytest.approx(-10.0)


def test_time2jsec():
    assert time2jsec(2000, 1, 1) == 0.0
    assert time2jsec(2000, 1, 2) == 86400.0
    # value used by coord_test: 2025-05-01 00:00
    t = time2jsec(2025, 5, 1)
    y, m, d, hh, mm, ss, r = jsec2time(t)
    assert (y, m, d, hh, mm, ss) == (2025, 5, 1, 0, 0, 0)


def test_ctl_parser(tmp_path):
    ctl_text = textwrap.dedent("""\
        NQ = 4
        QNT_NAME[0] = t
        QNT_NAME[1] = u
        QNT_NAME[2] = v
        QNT_NAME[3] = w
        METBASE = ../data/era5_utm32
        TRACER_CHEM = 0
        DIFFUSION = 1
        DT_MET = 3600.0
        T_STOP = 800000000
    """)
    f = tmp_path / "trac.ctl"
    f.write_text(ctl_text)
    ctl = read_ctl(str(f), ["MET_CAPE", "0", "DT_MOD", "600",
                            "MET_COORD_TYPE", "1",
                            "MET_UTM_REF_LON", "11.5692782",
                            "MET_UTM_REF_LAT", "48.1507476"])
    assert ctl.nq == 4
    assert ctl.qnt_name == ("t", "u", "v", "w")
    assert ctl.qnt("u") == 1
    assert ctl.qnt("m") == -1
    assert ctl.diffusion == 1
    assert ctl.dt_mod == 600.0       # CLI override beats default
    assert ctl.met_cape == 0
    assert ctl.met_coord_type == 1
    assert ctl.met_utm_ref_lon == pytest.approx(11.5692782)
    # defaults
    assert ctl.advect == 2
    assert ctl.rng_type == 1
    assert ctl.turb_mesox == 0.16
    assert ctl.turb_dz_strat == 0.1
    assert ctl.metbase.endswith("era5_utm32")


def test_ctl_case_insensitive_and_missing(tmp_path):
    f = tmp_path / "c.ctl"
    f.write_text("dt_mod = 60\n")
    s = CtlFile(str(f), [])
    assert s.scan_float("DT_MOD", -1, "180") == 60.0
    with pytest.raises(ValueError):
        s.scan("NOT_THERE")


def test_species_preset(tmp_path):
    f = tmp_path / "c.ctl"
    f.write_text("SPECIES = SO2\n")
    ctl = read_ctl(str(f), [])
    assert ctl.molmass == pytest.approx(64.066)
    assert ctl.oh_chem_reaction == 3
    assert ctl.oh_chem == pytest.approx((2.9e-31, 4.1, 1.7e-12, -0.2))
    assert ctl.wet_depo_ic_h[0] == pytest.approx(1.3e-2)
    # explicit MOLMASS overrides the preset
    ctl2 = read_ctl(str(f), ["MOLMASS", "99.9"])
    assert ctl2.molmass == pytest.approx(99.9)
