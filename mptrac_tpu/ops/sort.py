"""Particle sorting for memory locality (reference module_sort,
/root/reference/src/mptrac.c:5699-5811): periodically argsort all
particle arrays by met grid-box index so nearby parcels gather from
nearby met columns.  Replaces GSL/Thrust sort with XLA's radix
argsort.

Cost model on TPU v5e at 50M parcels: the argsort itself is cheap
(0.16 s); each column permute costs ~0.64 s (XLA gather is ~13 ns per
offset), so a full-state sort is ~8 s.  The production driver
therefore re-sorts ADAPTIVELY: the slab-interp kernel tracks the
fraction of parcels it could serve from sorted locality
(cache.served_min), and the driver only re-sorts when that dips below
threshold.  Spatial coherence means that is rare — parcel groups
drift coherently (the kernel's per-call anchors follow them) and only
DIFFERENTIAL motion (shear, diffusion ~0.01 cell/step) degrades
locality."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mptrac_tpu.ops import interp
from mptrac_tpu.types import Atm, Cache, Met


def sort_key(met: Met, atm: Atm) -> jnp.ndarray:
    """Met grid-box index per parcel (reference c:5770-5776:
    idx = (ix * ny + iy) * np + iz).

    Uses the SAME locator as the interpolation kernels (locate_3d,
    including the longitude wrap into the grid convention) so the
    sorted order matches the slab kernel's cell indices exactly."""
    lats = met.lat[0] if met.lat.ndim == 2 else met.lat
    ps = met.p[0] if met.p.ndim == 2 else met.p
    loc = interp.locate_3d(met, atm.lon, atm.lat, atm.p)
    ny, npl = lats.shape[0], ps.shape[0]
    key = (loc.ix * ny + loc.iy) * npl + loc.iz
    # keep padding at the end
    return jnp.where(atm.mask, key, jnp.iinfo(jnp.int32).max)


def _take_f32_pairs(cols, perm):
    """Permute the f32 state columns.

    On TPU the slab kernel's banded-gather mode serves 8 columns per
    gather offset (ops.slab_interp.permute_f32_cols); elsewhere plain
    per-column gathers.  (Packing columns into wider elements was
    tried — complex64, f64 bitcast — but XLA:TPU either cannot lower
    the bitcast or gathers the pair as two offsets.)"""
    import jax as _jax
    if _jax.default_backend() == "tpu":
        from mptrac_tpu.ops.slab_interp import permute_f32_cols
        out = []
        for i in range(0, len(cols), 8):
            out += permute_f32_cols(cols[i:i + 8], perm)
        return out
    return [jnp.take(c, perm) for c in cols]


def module_sort(met: Met, atm: Atm, cache: Cache):
    """Stable argsort by grid cell; permutes atm and the per-particle
    cache arrays consistently and resets the served diagnostic."""
    perm = jnp.argsort(sort_key(met, atm), stable=True)

    def take(x):
        return jnp.take(x, perm, axis=0)

    # (atm.mask is the prefix arange < np; masked parcels sort to the
    # end, so the permuted state keeps a consistent prefix mask)
    iso_per_parcel = cache.iso_var.shape[0] == atm.lon.shape[0]
    if atm.lon.dtype == jnp.float32 and cache.dt.dtype == jnp.float32:
        # time (f64) rides the f32 permute as an exact Dekker hi/lo
        # split (th + tl == time bitwise after reconstruction)
        th = atm.time.astype(jnp.float32)
        tl = (atm.time - th.astype(jnp.float64)).astype(jnp.float32)
        cols = [atm.lon, atm.lat, atm.p, cache.dt,
                cache.uvwp[0], cache.uvwp[1], cache.uvwp[2],
                th, tl]
        qnames = [k for k in atm.q
                  if atm.q[k].dtype == jnp.float32]
        cols += [atm.q[k] for k in qnames]
        if iso_per_parcel and cache.iso_var.dtype == jnp.float32:
            cols.append(cache.iso_var)
            iso_packed = True
        else:
            iso_packed = False
        out = _take_f32_pairs(cols, perm)
        lon, lat, p, dtc, u0, v0, w0, th2, tl2 = out[:9]
        time2 = (th2.astype(jnp.float64) + tl2.astype(jnp.float64))
        qvals = out[9:9 + len(qnames)]
        q = dict(atm.q)
        for k, v in zip(qnames, qvals):
            q[k] = v
        for k in q:
            if k not in qnames:
                q[k] = take(atm.q[k])
        atm2 = atm.replace(time=time2, p=p, lon=lon, lat=lat, q=q)
        iso2 = (out[9 + len(qnames)] if iso_packed
                else (take(cache.iso_var) if iso_per_parcel
                      else cache.iso_var))
        cache2 = cache.replace(
            uvwp=jnp.stack([u0, v0, w0]),
            dt=dtc.astype(cache.dt.dtype), iso_var=iso2)
    else:
        atm2 = atm.replace(
            time=take(atm.time), p=take(atm.p), lon=take(atm.lon),
            lat=take(atm.lat),
            q={k: take(v) for k, v in atm.q.items()})
        cache2 = cache.replace(
            uvwp=jnp.take(cache.uvwp, perm, axis=1),
            dt=take(cache.dt),
            iso_var=(take(cache.iso_var) if iso_per_parcel
                     else cache.iso_var))
    served = (jnp.asarray(1.0, jnp.float32)
              if cache.served_min is not None else None)
    return atm2, cache2.replace(served_min=served)
