"""Shared met-field sampling for the met_* tools.

Evaluates the standard 52-variable record (reference MET_HEADER,
mptrac.h:1182-1243 and INTPOL_SPACE_ALL, h:1020) at arbitrary
(p, lon, lat) points of a single met snapshot, plus climatology-based
quantities.  Used by met_map, met_prof, met_zm and met_sample.
"""

from __future__ import annotations

from typing import Dict

import jax.numpy as jnp
import numpy as np

from mptrac_tpu import climatology as cl
from mptrac_tpu.config import Ctl
from mptrac_tpu.ops import interp, thermo
from mptrac_tpu.types import Clim, Met

MET_HEADER = (
    "# $1 = time [s]\n# $2 = altitude [km]\n# $3 = longitude [deg]\n"
    "# $4 = latitude [deg]\n# $5 = pressure [hPa]\n"
    "# $6 = temperature [K]\n# $7 = zonal wind [m/s]\n"
    "# $8 = meridional wind [m/s]\n# $9 = vertical velocity [hPa/s]\n"
    "# $10 = H2O volume mixing ratio [ppv]\n"
    "# $11 = O3 volume mixing ratio [ppv]\n"
    "# $12 = geopotential height [km]\n"
    "# $13 = potential vorticity [PVU]\n"
    "# $14 = surface pressure [hPa]\n# $15 = surface temperature [K]\n"
    "# $16 = surface geopotential height [km]\n"
    "# $17 = surface zonal wind [m/s]\n"
    "# $18 = surface meridional wind [m/s]\n"
    "# $19 = eastward turbulent surface stress [N/m^2]\n"
    "# $20 = northward turbulent surface stress [N/m^2]\n"
    "# $21 = surface sensible heat flux [W/m^2]\n"
    "# $22 = land-sea mask [1]\n# $23 = sea surface temperature [K]\n"
    "# $24 = tropopause pressure [hPa]\n"
    "# $25 = tropopause geopotential height [km]\n"
    "# $26 = tropopause temperature [K]\n"
    "# $27 = tropopause water vapor [ppv]\n"
    "# $28 = cloud liquid water content [kg/kg]\n"
    "# $29 = cloud rain water content [kg/kg]\n"
    "# $30 = cloud ice water content [kg/kg]\n"
    "# $31 = cloud snow water content [kg/kg]\n"
    "# $32 = cloud cover [1]\n"
    "# $33 = total column cloud water [kg/m^2]\n"
    "# $34 = cloud top pressure [hPa]\n"
    "# $35 = cloud bottom pressure [hPa]\n"
    "# $36 = pressure at lifted condensation level (LCL) [hPa]\n"
    "# $37 = pressure at level of free convection (LFC) [hPa]\n"
    "# $38 = pressure at equilibrium level (EL) [hPa]\n"
    "# $39 = convective available potential energy (CAPE) [J/kg]\n"
    "# $40 = convective inhibition (CIN) [J/kg]\n"
    "# $41 = relative humidity over water [%]\n"
    "# $42 = relative humidity over ice [%]\n"
    "# $43 = dew point temperature [K]\n"
    "# $44 = frost point temperature [K]\n"
    "# $45 = NAT temperature [K]\n"
    "# $46 = HNO3 volume mixing ratio [ppv]\n"
    "# $47 = OH volume mixing ratio [ppv]\n"
    "# $48 = H2O2 volume mixing ratio [ppv]\n"
    "# $49 = HO2 volume mixing ratio [ppv]\n"
    "# $50 = O(1D) volume mixing ratio [ppv]\n"
    "# $51 = boundary layer pressure [hPa]\n"
    "# $52 = total column ozone [DU]\n"
    "# $53 = number of data points\n"
    "# $54 = number of tropopause data points\n"
    "# $55 = number of CAPE data points\n")

#: 3-D fields sampled by INTPOL_SPACE_ALL, in record order
_F3 = ("t", "u", "v", "w", "h2o", "o3", "z", "pv", "lwc", "rwc", "iwc",
       "swc", "cc")
_F2 = ("ps", "ts", "zs", "us", "vs", "ess", "nss", "shf", "lsm", "sst",
       "pt", "zt", "tt", "h2ot", "cl", "pct", "pcb", "plcl", "plfc",
       "pel", "cape", "cin", "pbl", "o3c")


def sample_met(ctl: Ctl, clim: Clim, met: Met, p, lon, lat
               ) -> Dict[str, np.ndarray]:
    """Sample all standard variables at point arrays (p, lon, lat)."""
    p = jnp.asarray(p, jnp.float64)
    lon = jnp.asarray(lon, jnp.float64)
    lat = jnp.asarray(lat, jnp.float64)
    loc = interp.locate_3d(met, lon, lat, p)
    out: Dict[str, np.ndarray] = {}
    for name in _F3:
        out[name] = np.asarray(interp.interp_3d(met.fields3d[name], loc))
    for name in _F2:
        out[name] = np.asarray(interp.interp_2d(met.fields2d[name], loc))
    pn = np.asarray(p)
    t = out["t"]
    h2o = out["h2o"]
    out["rh"] = np.asarray(thermo.rh(pn, t, h2o))
    out["rhice"] = np.asarray(thermo.rhice(pn, t, h2o))
    out["tdew"] = np.asarray(thermo.tdew(pn, h2o))
    out["tice"] = np.asarray(thermo.tice(pn, h2o))
    tj = jnp.full_like(lon, float(met.time))
    latr = lat if ctl.met_coord_type == 0 else jnp.full_like(
        lat, ctl.met_utm_ref_lat)
    hno3 = (cl.clim_zm(clim.zm["hno3"], tj, latr, p)
            if "hno3" in clim.zm else jnp.zeros_like(p))
    out["hno3"] = np.asarray(hno3)
    out["tnat"] = np.asarray(thermo.nat_temperature(p, jnp.asarray(h2o),
                                                    hno3))
    for key in ("oh", "h2o2", "ho2", "o1d"):
        if key == "oh" and "oh" in clim.zm:
            from mptrac_tpu.physics.chem import clim_oh
            out[key] = np.asarray(clim_oh(ctl, clim, tj, lon, lat, p))
        elif key in clim.zm:
            out[key] = np.asarray(cl.clim_zm(clim.zm[key], tj, latr, p))
        else:
            out[key] = np.zeros_like(pn)
    return out


def find_theta_level(met: Met, theta: float, lon, lat) -> np.ndarray:
    """Bisect the pressure of an isentropic level (reference
    met_map.c:243-255)."""
    lon = jnp.asarray(lon, jnp.float64)
    lat = jnp.asarray(lat, jnp.float64)
    p_grid = met.p
    ptop = jnp.full(lon.shape, float(p_grid[-1]))
    pbot = jnp.full(lon.shape, float(p_grid[0]))
    for _ in range(60):
        p0 = 0.5 * (ptop + pbot)
        loc = interp.locate_3d(met, lon, lat, p0)
        t0 = interp.interp_3d(met.fields3d["t"], loc)
        th = thermo.theta(p0, t0)
        above = th > theta
        ptop = jnp.where(above, p0, ptop)
        pbot = jnp.where(above, pbot, p0)
    return np.asarray(0.5 * (ptop + pbot))


def record_columns(time, zcol, lon, lat, p, s, npts=1, npt=1, npc=1):
    """Assemble the 55-column record values in MET_HEADER order."""
    return [time, zcol, lon, lat, p,
            s["t"], s["u"], s["v"], s["w"], s["h2o"], s["o3"], s["z"],
            s["pv"], s["ps"], s["ts"], s["zs"], s["us"], s["vs"],
            s["ess"], s["nss"], s["shf"], s["lsm"], s["sst"], s["pt"],
            s["zt"], s["tt"], s["h2ot"], s["lwc"], s["rwc"], s["iwc"],
            s["swc"], s["cc"], s["cl"], s["pct"], s["pcb"], s["plcl"],
            s["plfc"], s["pel"], s["cape"], s["cin"], s["rh"],
            s["rhice"], s["tdew"], s["tice"], s["tnat"], s["hno3"],
            s["oh"], s["h2o2"], s["ho2"], s["o1d"], s["pbl"], s["o3c"],
            npts, npt, npc]
