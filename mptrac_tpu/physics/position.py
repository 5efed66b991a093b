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

    # Pressure reflection at model top and surface (c:5464-5473).
    # Reference quirk, reproduced exactly: the surface-pressure lookup
    # is INTPOL_2D(ps, 0) over the freshly-zeroed INTPOL_INIT indices
    # (c:5433, 5468) — with ci = {0,0,0} and cw = {0,0,0,0} the
    # "interpolation" collapses to array[1][1], i.e. the reference
    # reflects every parcel at the surface pressure of grid cell
    # (1, 1), time-interpolated between the snapshots (not at the
    # parcel's own column).  Cheaper than a gather, and bit-compatible
    # with reference trajectories.
    ps_grid = met01.p[0] if met01.p.ndim == 2 else met01.p
    ptop = ps_grid[-1]
    p2 = jnp.where(p < ptop, ptop * ptop / p, p)
    ps2d = met01.fields2d["ps"]
    dtype = p2.dtype
    wt = interp.time_weight(met01, atm.time).astype(dtype)
    ps0 = ps2d[0, 1, 1].astype(dtype)
    ps1 = ps2d[1, 1, 1].astype(dtype)
    ps = wt * (ps0 - ps1) + ps1
    need_ps = p2 > 300.0
    p2 = jnp.where(need_ps & (p2 > ps), ps * ps / p2, p2)

    return atm.replace(
        lon=jnp.where(active, lon2, atm.lon),
        lat=jnp.where(active, lat2, atm.lat),
        p=jnp.where(active, p2, atm.p))
