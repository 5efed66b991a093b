"""Vectorized met preprocessing == the reference's scalar scans.

The WMO tropopause search (reference read_met_tropo, c:11835-12009)
and the bulk-Richardson PBL (read_met_pbl, c:11280-11334) are
per-column scalar scans in the reference; mptrac_tpu vectorizes them
over all columns.  These tests pin the vectorized implementations
against direct Python transcriptions of the reference loops on
synthetic atmospheres, and assert full-ERA5-size throughput.
"""

import time

import numpy as np
import pytest

from mptrac_tpu.config import read_ctl
from mptrac_tpu.constants import EPS, G0, H0, P0, RA
from mptrac_tpu.met.process import _pbl_richardson, _theta, tropopause


def synth_atmos(nx=24, ny=12, npl=40, seed=0):
    """Synthetic atmosphere with a realistic tropopause: 6.5 K/km
    tropospheric lapse, isothermal stratosphere, smooth noise."""
    rng = np.random.default_rng(seed)
    z = np.linspace(0, 48, npl)                    # km
    p = P0 * np.exp(-z / H0)
    zt = 9.0 + 6.0 * rng.random((nx, ny))          # tropopause height
    t_sfc = 270.0 + 30.0 * rng.random((nx, ny))
    t3 = np.empty((nx, ny, npl))
    for k in range(npl):
        below = t_sfc - 6.5 * z[k]
        above = t_sfc - 6.5 * zt
        t3[:, :, k] = np.where(z[k] < zt, below, above)
    t3 += rng.normal(0, 0.2, t3.shape)
    f2 = {
        "ps": (p[0] * (0.95 + 0.05 * rng.random((nx, ny)))
               ).astype(np.float64),
        "ts": t_sfc, "zs": 0.2 * rng.random((nx, ny)),
        "us": rng.normal(0, 3, (nx, ny)),
        "vs": rng.normal(0, 3, (nx, ny)),
    }
    zg = np.broadcast_to(z, (nx, ny, npl)).copy()
    zg += 0.05 * rng.random((nx, ny, npl))
    f3 = {
        "t": t3,
        "u": rng.normal(5, 5, (nx, ny, npl)),
        "v": rng.normal(0, 5, (nx, ny, npl)),
        "h2o": np.maximum(rng.normal(3e-3, 1e-3, (nx, ny, npl)), 0)
        * np.exp(-zg / 2.0),
        "z": zg,
        "pv": rng.normal(0, 2, (nx, ny, npl)) * (zg / 10) ** 2,
    }
    return p, f2, f3


# --------------------------------------------------------- reference loops

def pbl_richardson_scalar(p, f2, f3):
    """Direct transcription of the reference per-column scan
    (c:11280-11334)."""
    rib_crit, dz, umin = 0.25, 0.05, 5.0
    ps, ts, zs = f2["ps"], f2["ts"], f2["zs"]
    us, vs = f2["us"], f2["vs"]
    t, u, v = f3["t"], f3["u"], f3["v"]
    h2o, z = f3["h2o"], f3["z"]
    nx, ny, npl = t.shape
    out = np.empty((nx, ny))
    for ixx in range(nx):
        for iyy in range(ny):
            pbl_bot = ps[ixx, iyy] * np.exp(-dz / H0)
            ip = 1
            while ip < npl and not p[ip] < pbl_bot:
                ip += 1
            h2os = np.interp(pbl_bot, p[::-1], h2o[ixx, iyy][::-1])
            tvs = _theta(pbl_bot, ts[ixx, iyy]) * (
                1.0 + (1.0 - EPS) * max(h2os, 0.1e-6))
            rib_old = 0.0
            val = p[min(ip, npl - 1)]
            for ip2 in range(ip, npl):
                vh2 = max((u[ixx, iyy, ip2] - us[ixx, iyy]) ** 2
                          + (v[ixx, iyy, ip2] - vs[ixx, iyy]) ** 2,
                          umin ** 2)
                thv = _theta(p[ip2], t[ixx, iyy, ip2]) * (
                    1.0 + (1.0 - EPS)
                    * max(h2o[ixx, iyy, ip2], 0.1e-6))
                rib = (G0 * 1e3 * (z[ixx, iyy, ip2] - zs[ixx, iyy])
                       / tvs * (thv - tvs) / vh2)
                if rib >= rib_crit:
                    val = p[ip2 - 1] + (p[ip2] - p[ip2 - 1]) / (
                        rib - rib_old) * (rib_crit - rib_old)
                    if val > pbl_bot:
                        val = pbl_bot
                    break
                rib_old = rib
            out[ixx, iyy] = val
    return out


def wmo_scalar(met_tropo, p, t3):
    """Direct transcription of the reference WMO/cold-point scan
    (c:11895-11978), linear profile resampling."""
    nx, ny, npl = t3.shape
    z = H0 * np.log(P0 / p)
    z2 = 4.5 + 0.1 * np.arange(191)
    p2 = P0 * np.exp(-z2 / H0)

    def lapse_rate(p1, t1, pp2, t2):
        return (1e3 * G0 / RA * (t2 - t1) / (t2 + t1)
                * (pp2 + p1) / (pp2 - p1))

    pt = np.full((nx, ny), np.nan)
    for ixx in range(nx):
        for iyy in range(ny):
            if not np.all(np.isfinite(t3[ixx, iyy])):
                continue
            t2 = np.interp(z2, z, t3[ixx, iyy])
            if met_tropo == 2:
                iz = int(np.argmin(t2[:171]))
                if 0 < iz < 170:
                    pt[ixx, iyy] = p2[iz]
                continue
            iz_found = -1
            for iz in range(171):
                if all(lapse_rate(p2[iz], t2[iz], p2[iz2], t2[iz2])
                       <= 2.0 for iz2 in range(iz + 1, iz + 21)):
                    iz_found = iz
                    break
            if met_tropo == 4:
                iz = iz_found if iz_found >= 0 else 171
                while iz <= 170:
                    if all(lapse_rate(p2[iz], t2[iz], p2[iz2], t2[iz2])
                           >= 3.0 for iz2 in range(iz + 1, iz + 11)):
                        break
                    iz += 1
                iz_found = -1
                while iz <= 170:
                    if all(lapse_rate(p2[iz], t2[iz], p2[iz2], t2[iz2])
                           <= 2.0 for iz2 in range(iz + 1, iz + 21)):
                        iz_found = iz
                        break
                    iz += 1
            if 0 < iz_found < 170:
                pt[ixx, iyy] = p2[iz_found]
    return pt


# ----------------------------------------------------------------- tests

def test_pbl_richardson_matches_scalar():
    p, f2, f3 = synth_atmos()
    ctl = read_ctl(None, ["MET_PBL", "2", "METBASE", "-",
                          "T_STOP", "3600"])
    vec = _pbl_richardson(ctl, p, f2, f3)
    ref = pbl_richardson_scalar(p, f2, f3)
    np.testing.assert_allclose(vec, ref, rtol=1e-12)


@pytest.mark.parametrize("mode", [2, 3, 4])
def test_tropopause_matches_scalar(mode):
    p, f2, f3 = synth_atmos(seed=mode)
    nx, ny, _ = f3["t"].shape
    ctl = read_ctl(None, ["MET_TROPO", str(mode), "MET_TROPO_SPLINE",
                          "0", "METBASE", "-", "T_STOP", "3600"])
    f2v = dict(f2)
    lon = np.linspace(-180, 175, nx)
    lat = np.linspace(-89, 89, ny)
    tropopause(ctl, None, 0.0, lon, lat, p, f2v, f3)
    ref = wmo_scalar(mode, p, f3["t"])
    np.testing.assert_allclose(f2v["pt"].astype(np.float64), ref,
                               rtol=1e-6, equal_nan=True)


def test_tropopause_nan_columns():
    """Columns with missing data yield NaN (regional grids)."""
    p, f2, f3 = synth_atmos()
    f3["t"][3, 4, 7] = np.nan
    ctl = read_ctl(None, ["MET_TROPO", "3", "MET_TROPO_SPLINE", "0",
                          "METBASE", "-", "T_STOP", "3600"])
    nx, ny, _ = f3["t"].shape
    tropopause(ctl, None, 0.0, np.linspace(-180, 175, nx),
               np.linspace(-89, 89, ny), p, f2, f3)
    assert np.isnan(f2["pt"][3, 4])
    assert np.isfinite(f2["pt"][10, 5])


def test_tropopause_era5_size_fast():
    """The full-ERA5-grid preprocessing budget: WMO 1st tropopause on
    1444 x 724 columns must finish in seconds (the reference needs
    0.74 s in C, profiling.md:53; the former per-column Python loop
    needed hours)."""
    nx, ny, npl = 1444, 724, 61
    rng = np.random.default_rng(1)
    z = np.linspace(0, 48, npl)
    p = P0 * np.exp(-z / H0)
    zt = 9.0 + 6.0 * rng.random((nx, ny))
    t_sfc = 270.0 + 30.0 * rng.random((nx, ny))
    t3 = (t_sfc[..., None]
          - 6.5 * np.minimum(z[None, None, :], zt[..., None]))
    t3 = t3.astype(np.float64)
    ctl = read_ctl(None, ["MET_TROPO", "3", "MET_TROPO_SPLINE", "0",
                          "METBASE", "-", "T_STOP", "3600"])
    f2 = {"ps": np.full((nx, ny), p[0])}
    f3 = {"t": t3, "z": np.broadcast_to(z, t3.shape),
          "h2o": np.full_like(t3, 1e-3)}
    t0 = time.time()
    tropopause(ctl, None, 0.0, np.linspace(-180, 179.75, nx),
               np.linspace(-90, 90, ny), p, f2, f3)
    elapsed = time.time() - t0
    assert np.isfinite(f2["pt"]).mean() > 0.9
    assert elapsed < 60.0, f"tropopause too slow: {elapsed:.1f}s"
