"""Boundary conditions (reference module_bound_cond,
/root/reference/src/mptrac.c:3789-3885): re-initialize mass/vmr and
climatological tracer vmrs inside a latitude/pressure/surface-layer
region, and tag age of air."""

from __future__ import annotations

import jax.numpy as jnp

from mptrac_tpu.climatology import clim_ts
from mptrac_tpu.config import Ctl
from mptrac_tpu.ops import interp, thermo
from mptrac_tpu.types import Atm, Cache, Clim, Met


def module_bound_cond(ctl: Ctl, cache: Cache, clim: Clim, met01: Met,
                      atm: Atm) -> Atm:
    names = set(atm.q)
    wanted = {"m", "vmr", "Cccl4", "Cccl3f", "Cccl2f2", "Cn2o", "Csf6",
              "aoa"}
    if not names & wanted:
        return atm

    sel = ((cache.dt != 0.0) & atm.mask
           & (atm.lat >= ctl.bound_lat0) & (atm.lat <= ctl.bound_lat1)
           & (atm.p <= ctl.bound_p0) & (atm.p >= ctl.bound_p1))

    if (ctl.bound_dps > 0 or ctl.bound_dzs > 0 or ctl.bound_zetas > 0
            or ctl.bound_pbl):
        loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
        ps = interp.interp_time_2d(met01, "ps", atm.time, loc)
        if ctl.bound_dps > 0:
            sel = sel & ~(atm.p < ps - ctl.bound_dps)
        if ctl.bound_dzs > 0:
            sel = sel & ~(thermo.altitude(atm.p)
                          > thermo.altitude(ps) + ctl.bound_dzs)
        if ctl.bound_zetas > 0:
            t = interp.interp_time_3d(met01, "t", atm.time, loc)
            zeta = _zeta(ps, atm.p, t)
            sel = sel & ~(zeta > ctl.bound_zetas)
        if ctl.bound_pbl:
            pbl = interp.interp_time_2d(met01, "pbl", atm.time, loc)
            sel = sel & ~(atm.p < pbl)

    q = dict(atm.q)
    if "m" in q and ctl.bound_mass >= 0:
        q["m"] = jnp.where(
            sel, ctl.bound_mass + ctl.bound_mass_trend * atm.time, q["m"])
    if "vmr" in q and ctl.bound_vmr >= 0:
        q["vmr"] = jnp.where(
            sel, ctl.bound_vmr + ctl.bound_vmr_trend * atm.time, q["vmr"])
    for qn, key in (("Cccl4", "ccl4"), ("Cccl3f", "ccl3f"),
                    ("Cccl2f2", "ccl2f2"), ("Cn2o", "n2o"),
                    ("Csf6", "sf6")):
        if qn in q and key in clim.ts:
            q[qn] = jnp.where(sel, clim_ts(clim.ts[key], atm.time), q[qn])
    if "aoa" in q:
        q["aoa"] = jnp.where(sel, atm.time, q["aoa"])
    return atm.replace(q=q)


def _zeta(ps, p, t):
    """Hybrid sigma-theta coordinate (reference ZETA macro,
    mptrac.h:2083-2086): theta weighted by sin(pi/2 (1-sigma)/0.7) for
    sigma > 0.3, unweighted above."""
    sigma = p / ps
    theta = thermo.theta(p, t)
    w = jnp.where(sigma <= 0.3, 1.0,
                  jnp.sin(jnp.pi / 2.0 * (1.0 - sigma) / (1.0 - 0.3)))
    return w * theta
