"""Isosurface constraint (reference module_isosurf_init / module_isosurf,
/root/reference/src/mptrac.c:4878-5001): hold parcels on a surface of
constant pressure / density / potential temperature, or follow a
prescribed balloon pressure track."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from mptrac_tpu.config import Ctl
from mptrac_tpu.ops import interp
from mptrac_tpu.ops.interp import locate_irr
from mptrac_tpu.types import Atm, Cache, Met


def module_isosurf_init(ctl: Ctl, cache: Cache, met01: Met,
                        atm: Atm) -> Cache:
    if ctl.isosurf == 1:
        return cache.replace(iso_var=atm.p)
    if ctl.isosurf in (2, 3):
        loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
        t = interp.interp_time_3d(met01, "t", atm.time, loc)
        if ctl.isosurf == 2:
            return cache.replace(iso_var=atm.p / t)
        return cache.replace(iso_var=t * (1000.0 / atm.p) ** 0.286)
    if ctl.isosurf == 4:
        ts, ps = [], []
        with open(ctl.balloon) as f:
            for line in f:
                toks = line.split()
                if len(toks) >= 2:
                    try:
                        ts.append(float(toks[0]))
                        ps.append(float(toks[1]))
                    except ValueError:
                        continue
        if not ts:
            raise ValueError("Could not read any data!")
        return cache.replace(
            iso_ts=jnp.asarray(np.array(ts)),
            iso_ps=jnp.asarray(np.array(ps)),
            iso_n=jnp.asarray(len(ts), jnp.int32))
    return cache


def module_isosurf(ctl: Ctl, cache: Cache, met01: Met, atm: Atm) -> Atm:
    # reference PARTICLE_LOOP check_dt=0: applies to all parcels
    active = atm.mask
    if ctl.isosurf == 1:
        p_new = cache.iso_var
    elif ctl.isosurf in (2, 3):
        loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
        t = interp.interp_time_3d(met01, "t", atm.time, loc)
        if ctl.isosurf == 2:
            p_new = cache.iso_var * t
        else:
            p_new = 1000.0 * (cache.iso_var / t) ** (-1.0 / 0.286)
    elif ctl.isosurf == 4:
        ts, ps = cache.iso_ts, cache.iso_ps
        idx = locate_irr(ts, atm.time)
        p_interp = (ps[idx] + (ps[idx + 1] - ps[idx])
                    / (ts[idx + 1] - ts[idx]) * (atm.time - ts[idx]))
        p_new = jnp.where(atm.time <= ts[0], ps[0],
                          jnp.where(atm.time >= ts[-1], ps[-1], p_interp))
    else:
        return atm
    return atm.replace(p=jnp.where(active, p_new, atm.p))
