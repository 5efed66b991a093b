"""Extreme convection parameterization (reference module_convection,
/root/reference/src/mptrac.c:4094-4168): where CAPE exceeds the
threshold (and optionally within the PBL), parcels are randomly
redistributed in the vertical, uniform in density, between the surface
and the equilibrium level."""

from __future__ import annotations

import jax.numpy as jnp

from mptrac_tpu.config import Ctl
from mptrac_tpu.ops import interp
from mptrac_tpu.ops.rng import module_rng
from mptrac_tpu.types import Atm, Cache, Met


def module_convection(ctl: Ctl, cache: Cache, met01: Met, atm: Atm):
    n = atm.npmax
    rs, ctr = module_rng(ctl.rng_type, cache.rng_ctr, n, 0,
                         dtype=atm.lon.dtype)
    rs = rs[:n]
    cache = cache.replace(rng_ctr=ctr)

    active = (cache.dt != 0.0) & atm.mask
    loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
    ps = interp.interp_time_2d(met01, "ps", atm.time, loc)

    pbot = ps
    ptop = ps
    if ctl.conv_mix_pbl:
        pbl = interp.interp_time_2d(met01, "pbl", atm.time, loc)
        ptop = pbl - ctl.conv_pbl_trans * (ps - pbl)
    if ctl.conv_cape >= 0:
        cape = interp.interp_time_2d(met01, "cape", atm.time, loc)
        cin = interp.interp_time_2d(met01, "cin", atm.time, loc)
        pel = interp.interp_time_2d(met01, "pel", atm.time, loc)
        trig = (jnp.isfinite(cape) & (cape >= ctl.conv_cape)
                & ((ctl.conv_cin <= 0)
                   | (jnp.isfinite(cin) & (cin >= ctl.conv_cin))))
        ptop = jnp.where(trig, jnp.minimum(ptop, pel), ptop)

    mix = active & (ptop != pbot) & (atm.p >= ptop)

    loc_b = interp.locate_3d(met01, atm.lon, atm.lat, pbot)
    tbot = interp.interp_time_3d(met01, "t", atm.time, loc_b)
    loc_t = interp.locate_3d(met01, atm.lon, atm.lat, ptop)
    ttop = interp.interp_time_3d(met01, "t", atm.time, loc_t)
    rhobot = pbot / tbot
    rhotop = ptop / ttop
    rho = rhobot + (rhotop - rhobot) * rs
    p_new = pbot + (ptop - pbot) / jnp.where(
        rhotop != rhobot, rhotop - rhobot, 1.0) * (rho - rhobot)
    return atm.replace(p=jnp.where(mix, p_new, atm.p)), cache
