"""Per-particle time stepping (reference module_timesteps /
module_timesteps_init, /root/reference/src/mptrac.c:5811-5889)."""

from __future__ import annotations

import math

import jax.numpy as jnp

from mptrac_tpu.config import Ctl
from mptrac_tpu.types import Atm, Cache, Met


def module_timesteps(ctl: Ctl, cache: Cache, met0: Met, atm: Atm,
                     t) -> Cache:
    """dt[ip] = t - time[ip] for active parcels, 0 otherwise; parcels
    outside a local (non-global) met domain are frozen (c:5838-5852)."""
    d = ctl.direction
    active = ((d * (atm.time - ctl.t_start) >= 0)
              & (d * (atm.time - ctl.t_stop) <= 0)
              & (d * (atm.time - t) < 0))
    dt = jnp.where(active, t - atm.time, 0.0)

    if not ctl.dd:
        lon = met0.lon if met0.lon.ndim == 1 else met0.lon[0]
        lat = met0.lat if met0.lat.ndim == 1 else met0.lat[0]
        latmin = jnp.minimum(lat[0], lat[-1])
        latmax = jnp.maximum(lat[0], lat[-1])
        local = jnp.abs(lon[-1] - lon[0] - 360.0) >= 0.01
        outside = ((atm.lon <= lon[0]) | (atm.lon >= lon[-1])
                   | (atm.lat <= latmin) | (atm.lat >= latmax))
        dt = jnp.where(local & outside, 0.0, dt)
    # dd mode: parcels are in their owner's tile by construction; the
    # reference instead freezes on current_subdomain == -1 (c:5847)
    dt = jnp.where(atm.mask, dt, 0.0)
    # keep the cache dtype (fp32 mode stores dt in float32; the
    # t - time difference itself is small enough for float32)
    return cache.replace(dt=dt.astype(cache.dt.dtype))


def init_time_range(ctl: Ctl, atm_time) -> Ctl:
    """Set/round the simulation time range from the particle times
    (reference module_timesteps_init, c:5858).  Host-side; returns an
    updated Ctl."""
    import numpy as np
    times = np.asarray(atm_time)
    explicit = ctl.t_start > -1e99
    if ctl.direction == 1:
        t_start = ctl.t_start if explicit else float(times.min())
        t_stop = float(times.max()) if ctl.t_stop > 1e99 else ctl.t_stop
    else:
        t_start = ctl.t_start if explicit else float(times.max())
        t_stop = float(times.min()) if ctl.t_stop > 1e99 else ctl.t_stop
    if ctl.direction * (t_stop - t_start) <= 0:
        raise ValueError("Nothing to do! Check T_STOP and DIRECTION!")
    if ctl.direction == 1:
        t_start = math.floor(t_start / ctl.dt_mod) * ctl.dt_mod
    else:
        t_start = math.ceil(t_start / ctl.dt_mod) * ctl.dt_mod
    return ctl.replace(t_start=t_start, t_stop=t_stop)
