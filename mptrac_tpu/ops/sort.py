"""Particle sorting for memory locality (reference module_sort,
/root/reference/src/mptrac.c:5699-5811): periodically argsort all
particle arrays by met grid-box index so nearby parcels gather from
nearby met columns.  Replaces GSL/Thrust sort with jax.numpy.argsort
(XLA radix/merge sort on TPU)."""

from __future__ import annotations

import jax.numpy as jnp

from mptrac_tpu.ops import interp
from mptrac_tpu.types import Atm, Cache, Met


def sort_key(met: Met, atm: Atm) -> jnp.ndarray:
    """Met grid-box index per parcel (reference c:5770-5776:
    idx = (ix * ny + iy) * np + iz)."""
    lons = met.lon[0] if met.lon.ndim == 2 else met.lon
    lats = met.lat[0] if met.lat.ndim == 2 else met.lat
    ps = met.p[0] if met.p.ndim == 2 else met.p
    ix = interp.locate_reg(lons, atm.lon)
    iy = interp.locate_irr(lats, atm.lat)
    iz = interp.locate_irr(ps, atm.p)
    ny, npl = lats.shape[0], ps.shape[0]
    key = (ix * ny + iy) * npl + iz
    # keep padding at the end
    return jnp.where(atm.mask, key, jnp.iinfo(jnp.int32).max)


def module_sort(met: Met, atm: Atm, cache: Cache):
    """Stable argsort by grid cell; permutes atm and the per-particle
    cache arrays consistently."""
    perm = jnp.argsort(sort_key(met, atm), stable=True)

    def take(x):
        return jnp.take(x, perm, axis=0)

    atm2 = atm.replace(
        time=take(atm.time), p=take(atm.p), lon=take(atm.lon),
        lat=take(atm.lat), q={k: take(v) for k, v in atm.q.items()})
    cache2 = cache.replace(
        uvwp=jnp.take(cache.uvwp, perm, axis=1),
        dt=take(cache.dt), iso_var=take(cache.iso_var))
    return atm2, cache2
