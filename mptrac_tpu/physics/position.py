"""Position checks: wrap/reflect coordinates and pressure
(reference module_position, /root/reference/src/mptrac.c:5419-5477)."""

from __future__ import annotations

import jax.numpy as jnp

from mptrac_tpu.ops import interp
from mptrac_tpu.ops.thermo import fmod
from mptrac_tpu.types import Atm, Cache, Met


def module_position(cache: Cache, met01: Met, atm: Atm,
                    sfc=None) -> Atm:
    active = (cache.dt != 0.0) & atm.mask
    lon, lat, p = atm.lon, atm.lat, atm.p

    if met01.coord_type == 0:
        lon2 = fmod(lon, 360.0)
        lat2 = fmod(lat, 360.0)
        # Reflect latitude at the poles.  After fmod, |lat| < 360; the
        # reference while-loop converges within two reflections.
        for _ in range(2):
            over = lat2 > 90.0
            under = lat2 < -90.0
            lon2 = jnp.where(over | under, lon2 + 180.0, lon2)
            lat2 = jnp.where(over, 180.0 - lat2, lat2)
            lat2 = jnp.where(under, -180.0 - lat2, lat2)
        # Wrap longitude into [-180, 180).  Bounded by a few turns.
        for _ in range(3):
            lon2 = jnp.where(lon2 < -180.0, lon2 + 360.0, lon2)
            lon2 = jnp.where(lon2 >= 180.0, lon2 - 360.0, lon2)
    else:
        glon = met01.lon[0] if met01.lon.ndim == 2 else met01.lon
        glat = met01.lat[0] if met01.lat.ndim == 2 else met01.lat
        lon2, lat2 = interp.check_cartesian(glon, glat, lon, lat)

    # Pressure reflection at model top and surface (c:5464-5473)
    ps_grid = met01.p[0] if met01.p.ndim == 2 else met01.p
    ptop = ps_grid[-1]
    p2 = jnp.where(p < ptop, ptop * ptop / p, p)
    loc = interp.locate_3d(met01, lon2, lat2, p2)
    if sfc is not None:
        from mptrac_tpu.ops.fast_interp import interp_sfc_packed
        ps = interp_sfc_packed(met01, sfc, ("ps",), atm.time,
                               loc)["ps"]
    else:
        ps = interp.interp_time_2d(met01, "ps", atm.time, loc)
    need_ps = p2 > 300.0
    p2 = jnp.where(need_ps & (p2 > ps), ps * ps / p2, p2)

    return atm.replace(
        lon=jnp.where(active, lon2, atm.lon),
        lat=jnp.where(active, lat2, atm.lat),
        p=jnp.where(active, p2, atm.p))
