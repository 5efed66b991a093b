"""Gridded / statistical output writers.

Host-side numpy rebuilds of the reference output subsystem
(/root/reference/src/mptrac.c): write_grid c:13242, write_grid_asc
c:13441, write_csi c:12864, write_ens c:13142, write_prof c:14165,
write_sample c:14395, write_station c:14560, write_vtk c:14649.

Stateful writers (csi/prof/sample/station keep one open file across
the run) are classes; an :class:`OutputManager` owns them per run.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import numpy as np

from mptrac_tpu.config import Ctl
from mptrac_tpu.constants import H0, MA, P0, RA, RE
from mptrac_tpu.io.kernel import kernel_weight, read_kernel
from mptrac_tpu.io.obs import read_obs
from mptrac_tpu.timeutil import jsec2time
from mptrac_tpu.types import Atm

_D2R = np.pi / 180.0


def _z(p):
    return H0 * np.log(P0 / p)


def _press(z):
    return P0 * np.exp(-z / H0)


def _rho(p, t):
    return 100.0 * p / (RA * t)


def _geo2cart(lon, lat):
    latr = _D2R * np.asarray(lat)
    lonr = _D2R * np.asarray(lon)
    cl = np.cos(latr)
    return np.stack([RE * cl * np.cos(lonr), RE * cl * np.sin(lonr),
                     RE * np.sin(latr)], axis=-1)


def _fmt(fmt: str, v: float) -> str:
    return fmt % v


def _atm_arrays(ctl: Ctl, atm: Atm):
    n = int(atm.np)
    return (np.asarray(atm.time)[:n], np.asarray(atm.p)[:n],
            np.asarray(atm.lon)[:n], np.asarray(atm.lat)[:n],
            {k: np.asarray(v)[:n] for k, v in atm.q.items()})


def _interp_met_t(metbuf, t, p, lon, lat, name="t"):
    """Host-side met interpolation for output diagnostics."""
    import jax.numpy as jnp
    from mptrac_tpu.ops import interp
    met01 = metbuf.pair
    loc = interp.locate_3d(met01, jnp.asarray(lon, jnp.float64),
                           jnp.asarray(lat, jnp.float64),
                           jnp.asarray(p, jnp.float64))
    val = interp.interp_time_3d(met01, name,
                                jnp.full(np.shape(lon), t, jnp.float64),
                                loc)
    return np.asarray(val)


class GridWriter:
    """Binned 3-D grid output (reference write_grid, c:13242)."""

    def __init__(self, ctl: Ctl):
        self.ctl = ctl
        self.kz = self.kw = None
        if ctl.grid_kernel != "-":
            self.kz, self.kw = read_kernel(ctl.grid_kernel)

    def _bin_device(self, atm: Atm, t: float):
        """Parcel-to-grid binning as one on-device segment-sum pass
        (replaces host bincount — unusable at 100M parcels; the host
        only formats the [nx*ny*nz] results)."""
        import jax
        import jax.numpy as jnp
        ctl = self.ctl
        nx, ny, nz = ctl.grid_nx, ctl.grid_ny, ctl.grid_nz
        ngrid = nx * ny * nz
        dz = (ctl.grid_z1 - ctl.grid_z0) / nz
        dlon = (ctl.grid_lon1 - ctl.grid_lon0) / nx
        dlat = (ctl.grid_lat1 - ctl.grid_lat0) / ny
        kz = (jnp.asarray(self.kz) if self.kz is not None
              and len(self.kz) >= 2 else None)
        kw = jnp.asarray(self.kw) if kz is not None else None

        @jax.jit
        def bin_all(time, p, lon, lat, mask, qs, t):
            t0, t1 = t - 0.5 * ctl.dt_mod, t + 0.5 * ctl.dt_mod
            z = H0 * jnp.log(P0 / p)
            ix = jnp.floor((lon - ctl.grid_lon0) / dlon).astype(
                jnp.int32)
            iy = jnp.floor((lat - ctl.grid_lat0) / dlat).astype(
                jnp.int32)
            iz = jnp.floor((z - ctl.grid_z0) / dz).astype(jnp.int32)
            ok = (mask & (time >= t0) & (time <= t1)
                  & (ix >= 0) & (ix < nx) & (iy >= 0) & (iy < ny)
                  & (iz >= 0) & (iz < nz))
            idx = jnp.where(ok, (ix * ny + iy) * nz + iz, ngrid)
            kern = (jnp.interp(z, kz, kw) if kz is not None
                    else jnp.ones_like(z))
            one = jnp.where(ok, 1.0, 0.0)
            cnt = jnp.zeros(ngrid + 1).at[idx].add(one)[:ngrid]
            sums = {}
            for name, qv in qs.items():
                kq = kern * qv
                s1 = jnp.zeros(ngrid + 1).at[idx].add(
                    jnp.where(ok, kq, 0.0))[:ngrid]
                s2 = jnp.zeros(ngrid + 1).at[idx].add(
                    jnp.where(ok, kq * kq, 0.0))[:ngrid]
                sums[name] = (s1, s2)
            return cnt, sums

        n = atm.npmax
        cnt, sums = bin_all(atm.time[:n], atm.p[:n], atm.lon[:n],
                            atm.lat[:n], atm.mask[:n],
                            {k: v[:n] for k, v in atm.q.items()},
                            jnp.asarray(t, atm.time.dtype))
        cnt = np.asarray(cnt)
        means, sigmas = {}, {}
        for name in ctl.qnt_name:
            s1 = np.asarray(sums[name][0], np.float64)
            s2 = np.asarray(sums[name][1], np.float64)
            with np.errstate(invalid="ignore", divide="ignore"):
                mean = np.where(cnt > 0, s1 / np.maximum(cnt, 1),
                                np.nan)
                var = s2 / np.maximum(cnt, 1) - mean ** 2
                sig = np.where(cnt > 0,
                               np.sqrt(np.maximum(var, 0)), np.nan)
            means[name] = (s1, mean)
            sigmas[name] = sig
        return cnt.astype(np.int64), means, sigmas

    def write(self, filename: str, metbuf, atm: Atm, t: float):
        ctl = self.ctl
        nx, ny, nz = ctl.grid_nx, ctl.grid_ny, ctl.grid_nz
        dz = (ctl.grid_z1 - ctl.grid_z0) / nz
        dlon = (ctl.grid_lon1 - ctl.grid_lon0) / nx
        dlat = (ctl.grid_lat1 - ctl.grid_lat0) / ny
        zc = ctl.grid_z0 + dz * (np.arange(nz) + 0.5)
        pressc = _press(zc)
        lonc = ctl.grid_lon0 + dlon * (np.arange(nx) + 0.5)
        latc = ctl.grid_lat0 + dlat * (np.arange(ny) + 0.5)
        area = (dlat * dlon * (RE * np.pi / 180.0) ** 2
                * np.cos(_D2R * latc))
        ngrid = nx * ny * nz

        cnt, means, sigmas = self._bin_device(atm, t)

        area3 = np.repeat(np.tile(area, nx), nz)
        cd = np.full(ngrid, np.nan)
        vmr_impl = np.full(ngrid, np.nan)
        if "m" in ctl.qnt_name:
            msum = means["m"][0]
            cd = msum / (1e6 * area3)
            if ctl.molmass > 0 and metbuf is not None:
                iz3 = np.tile(np.arange(nz), nx * ny)
                ix3 = np.repeat(np.arange(nx), ny * nz)
                iy3 = np.tile(np.repeat(np.arange(ny), nz), nx)
                temp = _interp_met_t(metbuf, t, pressc[iz3], lonc[ix3],
                                     latc[iy3])
                vmr_impl = np.where(
                    msum > 0,
                    MA / ctl.molmass * cd / (_rho(pressc[iz3], temp)
                                             * dz * 1e3), 0.0)

        if ctl.grid_type == 1:
            self._write_nc(filename, t, zc, lonc, latc, area, dz, cd,
                           vmr_impl, cnt, means, sigmas)
            return

        if ctl.grid_gpfile != "-":
            from mptrac_tpu.io.atm_io import _gnuplot_pipe, _PipeCtx
            sink = _PipeCtx(_gnuplot_pipe(ctl.grid_gpfile, filename, t))
        else:
            sink = open(filename, "w")
        with sink as out:
            out.write(
                "# $1 = time [s]\n# $2 = altitude [km]\n"
                "# $3 = longitude [deg]\n# $4 = latitude [deg]\n"
                "# $5 = surface area [km^2]\n# $6 = layer depth [km]\n"
                "# $7 = column density (implicit) [kg/m^2]\n"
                "# $8 = volume mixing ratio (implicit) [ppv]\n"
                "# $9 = number of particles [1]\n")
            for iq, name in enumerate(ctl.qnt_name):
                out.write(f"# ${10 + iq} = {name} (mean) "
                          f"[{ctl.qnt_unit[iq]}]\n")
            if ctl.grid_stddev:
                for iq, name in enumerate(ctl.qnt_name):
                    out.write(f"# ${10 + ctl.nq + iq} = {name} (stddev) "
                              f"[{ctl.qnt_unit[iq]}]\n")
            out.write("\n")
            for gx in range(nx):
                if gx > 0 and ny > 1 and not ctl.grid_sparse:
                    out.write("\n")
                for gy in range(ny):
                    if gy > 0 and nz > 1 and not ctl.grid_sparse:
                        out.write("\n")
                    for gz in range(nz):
                        gi = (gx * ny + gy) * nz + gz
                        if ctl.grid_sparse and not vmr_impl[gi] > 0:
                            continue
                        out.write(
                            "%.2f %g %g %g %g %g %g %g %d" % (
                                t, zc[gz], lonc[gx], latc[gy], area[gy],
                                dz, cd[gi], vmr_impl[gi], cnt[gi]))
                        for iq, name in enumerate(ctl.qnt_name):
                            out.write(" " + _fmt(ctl.qnt_format[iq],
                                                 means[name][1][gi]))
                        if ctl.grid_stddev:
                            for iq, name in enumerate(ctl.qnt_name):
                                out.write(" " + _fmt(ctl.qnt_format[iq],
                                                     sigmas[name][gi]))
                        out.write("\n")

    def _write_nc(self, filename, t, zc, lonc, latc, area, dz, cd,
                  vmr_impl, cnt, means, sigmas):
        """netCDF grid variant (reference write_grid_nc,
        c:13540-13663): dims (time, z, lat, lon), data transposed from
        the internal (ix, iy, iz) order to (iz, iy, ix).  Written as
        netCDF3 classic via scipy (the reference's GRID_NC_LEVEL
        deflate applies to its netCDF4 backend only)."""
        from scipy.io import netcdf_file
        ctl = self.ctl
        nx, ny, nz = ctl.grid_nx, ctl.grid_ny, ctl.grid_nz

        def t3(a):
            # (ix, iy, iz) flat -> [1, iz, iy, ix]
            return np.ascontiguousarray(
                np.asarray(a).reshape(nx, ny, nz).transpose(2, 1, 0)
            )[None]

        nc = netcdf_file(filename, "w")
        nc.createDimension("time", 1)
        nc.createDimension("z", nz)
        nc.createDimension("lat", ny)
        nc.createDimension("lon", nx)
        nc.createDimension("dz", 1)

        def defvar(name, dtype, dims, longname, unit, data):
            v = nc.createVariable(name, dtype, dims)
            v.long_name = longname
            v.units = unit
            v[:] = data
            return v

        defvar("time", "d", ("time",), "time",
               "seconds since 2000-01-01 00:00:00 UTC", [t])
        defvar("z", "d", ("z",), "altitude", "km", zc)
        defvar("lat", "d", ("lat",), "latitude", "degrees_north", latc)
        defvar("lon", "d", ("lon",), "longitude", "degrees_east", lonc)
        defvar("dz", "d", ("dz",), "layer depth", "km", [dz])
        defvar("area", "d", ("lat",), "surface area", "km**2", area)
        dims4 = ("time", "z", "lat", "lon")
        defvar("cd", "f", dims4, "column density", "kg m**-2", t3(cd))
        defvar("vmr_impl", "f", dims4,
               "volume mixing ratio (implicit)", "ppv", t3(vmr_impl))
        defvar("np", "i", dims4, "number of particles", "1",
               t3(cnt).astype(np.int32))
        for iq, name in enumerate(ctl.qnt_name):
            defvar(f"{name}_mean", "d", dims4, f"{name} (mean)",
                   ctl.qnt_unit[iq], t3(means[name][1]))
            if ctl.grid_stddev:
                defvar(f"{name}_stddev", "d", dims4,
                       f"{name} (stddev)", ctl.qnt_unit[iq],
                       t3(sigmas[name]))
        nc.close()


class EnsWriter:
    """Per-ensemble mean/stddev output (reference write_ens, c:13142).

    Note: the reference snapshot accumulates into the constant bin
    ``ctl->qnt_ens`` (c:13191-13199) — an apparent regression; this
    implementation bins by each parcel's ensemble ID, the documented
    intent."""

    def __init__(self, ctl: Ctl):
        if ctl.qnt("ens") < 0:
            raise ValueError("Missing ensemble IDs!")
        self.ctl = ctl

    def write(self, filename: str, atm: Atm, t: float):
        ctl = self.ctl
        time, p, lon, lat, q = _atm_arrays(ctl, atm)
        t0, t1 = t - 0.5 * ctl.dt_mod, t + 0.5 * ctl.dt_mod
        ok = (time >= t0) & (time <= t1)
        ens = q["ens"].astype(int)
        nens = max(int(ens.max(initial=0)) + 1, 1)
        if (ens[ok] < 0).any():
            raise ValueError("Ensemble ID is out of range!")
        x = _geo2cart(lon, lat)
        cnt = np.bincount(ens[ok], minlength=nens)
        zs = np.bincount(ens[ok], weights=_z(p)[ok], minlength=nens)
        xm = np.stack([np.bincount(ens[ok], weights=x[ok, i],
                                   minlength=nens) for i in range(3)],
                      axis=-1)
        with open(filename, "w") as out:
            out.write("# $1 = time [s]\n# $2 = altitude [km]\n"
                      "# $3 = longitude [deg]\n# $4 = latitude [deg]\n")
            for iq, name in enumerate(ctl.qnt_name):
                out.write(f"# ${5 + iq} = {name} (mean) "
                          f"[{ctl.qnt_unit[iq]}]\n")
            for iq, name in enumerate(ctl.qnt_name):
                out.write(f"# ${5 + ctl.nq + iq} = {name} (sigma) "
                          f"[{ctl.qnt_unit[iq]}]\n")
            out.write(f"# ${5 + 2 * ctl.nq} = number of members\n\n")
            for e in range(nens):
                if cnt[e] == 0:
                    continue
                xmean = xm[e]
                latm = np.rad2deg(math.asin(
                    xmean[2] / np.linalg.norm(xmean)))
                lonm = np.rad2deg(math.atan2(xmean[1], xmean[0]))
                out.write("%.2f %g %g %g" % (t, zs[e] / cnt[e], lonm,
                                             latm))
                for iq, name in enumerate(ctl.qnt_name):
                    qm = np.sum(q[name][ok & (ens == e)]) / cnt[e]
                    out.write(" " + _fmt(ctl.qnt_format[iq], qm))
                for iq, name in enumerate(ctl.qnt_name):
                    vals = q[name][ok & (ens == e)]
                    var = np.mean(vals ** 2) - np.mean(vals) ** 2
                    out.write(" " + _fmt(ctl.qnt_format[iq],
                                         math.sqrt(var) if var > 0
                                         else 0.0))
                out.write(" %d\n" % cnt[e])


class StationWriter:
    """Time series of parcels near a station (reference write_station,
    c:14560).  Keeps one open file across the run and sets the parcel
    station flag."""

    def __init__(self, ctl: Ctl, filename: str):
        self.ctl = ctl
        self.out = open(filename, "w")
        self.out.write("# $1 = time [s]\n# $2 = altitude [km]\n"
                       "# $3 = longitude [deg]\n# $4 = latitude [deg]\n")
        for iq, name in enumerate(ctl.qnt_name):
            self.out.write(f"# ${iq + 5} = {name} "
                           f"[{ctl.qnt_unit[iq]}]\n")
        self.out.write("\n")
        self.x0 = _geo2cart(ctl.stat_lon, ctl.stat_lat)
        self.rmax2 = ctl.stat_r ** 2

    def write(self, atm: Atm, t: float):
        ctl = self.ctl
        time, p, lon, lat, q = _atm_arrays(ctl, atm)
        t0, t1 = t - 0.5 * ctl.dt_mod, t + 0.5 * ctl.dt_mod
        ok = ((time >= t0) & (time <= t1) & (time >= ctl.stat_t0)
              & (time <= ctl.stat_t1))
        if "stat" in q:
            ok &= q["stat"].astype(int) == 0
        x1 = _geo2cart(lon, lat)
        d2 = np.sum((x1 - self.x0) ** 2, axis=-1)
        ok &= d2 <= self.rmax2
        hit = np.nonzero(ok)[0]
        if "stat" in q and hit.size:
            # The reference sets the station flag BEFORE printing the
            # row (c:14629-14637), so written rows show stat = 1.
            q = dict(q)
            stat = np.asarray(q["stat"]).copy()
            stat[hit] = 1
            q["stat"] = stat
        for ip in hit:
            self.out.write("%.2f %g %g %g" % (time[ip], _z(p[ip]),
                                              lon[ip], lat[ip]))
            for iq, name in enumerate(ctl.qnt_name):
                self.out.write(" " + _fmt(ctl.qnt_format[iq],
                                          q[name][ip]))
            self.out.write("\n")
        self.out.flush()
        if "stat" in q and hit.size:
            # set station flags on device state
            import jax.numpy as jnp
            atm.q["stat"] = jnp.asarray(q["stat"])

    def close(self):
        self.out.close()


class VtkWriter:
    """ParaView VTK point-cloud output (reference write_vtk, c:14649)."""

    def __init__(self, ctl: Ctl):
        self.ctl = ctl

    def write(self, filename: str, atm: Atm, t: float):
        ctl = self.ctl
        time, p, lon, lat, q = _atm_arrays(ctl, atm)
        t0, t1 = t - 0.5 * ctl.dt_mod, t + 0.5 * ctl.dt_mod
        sel = np.arange(0, time.size, ctl.vtk_stride)
        sel = sel[(time[sel] >= t0) & (time[sel] <= t1)]
        with open(filename, "w") as out:
            out.write("# vtk DataFile Version 3.0\n"
                      "vtk output\nASCII\nDATASET POLYDATA\n")
            out.write(f"POINTS {sel.size} float\n")
            if ctl.vtk_sphere:
                radius = (RE + _z(p[sel]) * ctl.vtk_scale
                          + ctl.vtk_offset) / RE
                cl = np.cos(_D2R * lat[sel])
                for r, c, lo, la in zip(radius, cl, lon[sel], lat[sel]):
                    out.write("%g %g %g\n" % (
                        r * c * math.cos(_D2R * lo),
                        r * c * math.sin(_D2R * lo),
                        r * math.sin(_D2R * la)))
            else:
                zz = _z(p[sel]) * ctl.vtk_scale + ctl.vtk_offset
                for lo, la, z in zip(lon[sel], lat[sel], zz):
                    out.write("%g %g %g\n" % (lo, la, z))
            out.write(f"POINT_DATA {sel.size}\n")
            for iq, name in enumerate(ctl.qnt_name):
                out.write(f"SCALARS {name} float 1\n"
                          "LOOKUP_TABLE default\n")
                for v in q[name][sel]:
                    out.write("%g\n" % v)


class CsiWriter:
    """Verification vs observations: contingency table + error stats
    (reference write_csi, c:12864)."""

    def __init__(self, ctl: Ctl, filename: str):
        if ctl.qnt("m") < 0:
            raise ValueError("Need quantity mass!")
        self.ctl = ctl
        self.ensemble = ctl.nens > 0
        if self.ensemble and ctl.qnt("ens") < 0:
            raise ValueError("Missing ensemble IDs!")
        self.rt, self.rz, self.rlon, self.rlat, self.robs = read_obs(
            ctl.csi_obsfile, ctl)
        self.kz = self.kw = None
        if ctl.csi_kernel != "-":
            self.kz, self.kw = read_kernel(ctl.csi_kernel)
        self.out = open(filename, "w")
        self.out.write(
            "# $1 = time [s]\n# $2 = ensemble ID\n"
            "# $3 = number of hits (cx)\n# $4 = number of misses (cy)\n"
            "# $5 = number of false alarms (cz)\n"
            "# $6 = number of observations (cx + cy)\n"
            "# $7 = number of forecasts (cx + cz)\n# $8 = bias (%)\n"
            "# $9 = POD (%)\n# $10 = FAR (%)\n# $11 = CSI (%)\n"
            "# $12 = hits by random chance\n# $13 = ETS (%)\n"
            "# $14 = Pearson R\n# $15 = Spearman R\n"
            "# $16 = mean error [kg/m²]\n# $17 = RMSE [kg/m²]\n"
            "# $18 = MAE [kg/m²]\n# $19 = log-likelihood\n"
            "# $20 = number of points\n\n")
        nensb = ctl.nens if self.ensemble else 1
        self.ct = np.zeros(nensb, int)
        self.cx = np.zeros(nensb, int)
        self.cy = np.zeros(nensb, int)
        self.cz = np.zeros(nensb, int)
        self.x = [[] for _ in range(nensb)]
        self.y = [[] for _ in range(nensb)]
        self.obsstdn = [[] for _ in range(nensb)]

    def write(self, atm: Atm, t: float):
        ctl = self.ctl
        nx, ny, nz = ctl.csi_nx, ctl.csi_ny, ctl.csi_nz
        grid = nx * ny * nz
        dz = (ctl.csi_z1 - ctl.csi_z0) / nz
        dlon = (ctl.csi_lon1 - ctl.csi_lon0) / nx
        dlat = (ctl.csi_lat1 - ctl.csi_lat0) / ny
        latc = ctl.csi_lat0 + dlat * (np.arange(ny) + 0.5)
        area = (dlat * dlon * (RE * np.pi / 180.0) ** 2
                * np.cos(_D2R * latc))
        t0, t1 = t - 0.5 * ctl.dt_mod, t + 0.5 * ctl.dt_mod

        # Observations
        sel = ((self.rt >= t0) & (self.rt < t1)
               & np.isfinite(self.robs))
        oix = ((self.rlon - ctl.csi_lon0) / dlon).astype(int)
        oiy = ((self.rlat - ctl.csi_lat0) / dlat).astype(int)
        oiz = ((self.rz - ctl.csi_z0) / dz).astype(int)
        sel &= ((oix >= 0) & (oix < nx) & (oiy >= 0) & (oiy < ny)
                & (oiz >= 0) & (oiz < nz))
        oidx = (oix * ny + oiy) * nz + oiz
        obscount = np.bincount(oidx[sel], minlength=grid)
        obssum = np.bincount(oidx[sel], weights=self.robs[sel],
                             minlength=grid)
        obssum2 = np.bincount(oidx[sel], weights=self.robs[sel] ** 2,
                              minlength=grid)
        with np.errstate(invalid="ignore", divide="ignore"):
            obsmean = np.where(obscount > 0,
                               obssum / np.maximum(obscount, 1), 0.0)
            obsstd = np.sqrt(np.maximum(
                obssum2 / np.maximum(obscount, 1) - obsmean ** 2, 0.0))

        # Model
        time, p, lon, lat, q = _atm_arrays(ctl, atm)
        ok = (time >= t0) & (time <= t1)
        ens = (q["ens"].astype(int) if self.ensemble
               else np.zeros(time.size, int))
        mix = ((lon - ctl.csi_lon0) / dlon).astype(int)
        miy = ((lat - ctl.csi_lat0) / dlat).astype(int)
        miz = ((_z(p) - ctl.csi_z0) / dz).astype(int)
        ok &= ((mix >= 0) & (mix < nx) & (miy >= 0) & (miy < ny)
               & (miz >= 0) & (miz < nz))
        kern = kernel_weight(self.kz, self.kw, p)
        nensb = self.ct.size
        midx = ens * grid + (mix * ny + miy) * nz + miz
        modsum = np.bincount(midx[ok], weights=(kern * q["m"])[ok],
                             minlength=grid * nensb)

        area3 = np.tile(np.repeat(area, nz), nx)
        for e in range(nensb):
            mm = modsum[e * grid:(e + 1) * grid].copy()
            pos = mm > 0
            mm[pos] = mm[pos] / (1e6 * area3[pos])
            has_obs = obscount > 0
            self.ct[e] += int(has_obs.sum())
            hits = has_obs & (obsmean >= ctl.csi_obsmin) & (
                mm >= ctl.csi_modmin)
            misses = has_obs & (obsmean >= ctl.csi_obsmin) & ~(
                mm >= ctl.csi_modmin)
            fals = has_obs & ~(obsmean >= ctl.csi_obsmin) & (
                mm >= ctl.csi_modmin)
            self.cx[e] += int(hits.sum())
            self.cy[e] += int(misses.sum())
            self.cz[e] += int(fals.sum())
            keep = has_obs & ((obsmean >= ctl.csi_obsmin)
                              | (mm >= ctl.csi_modmin))
            self.x[e] += list(mm[keep])
            self.y[e] += list(obsmean[keep])
            self.obsstdn[e] += list(np.where(mm[keep] >= ctl.csi_modmin,
                                             obsstd[keep], 0.0))

        if math.fmod(t, ctl.csi_dt_out) == 0:
            for e in range(nensb):
                self._flush(e, t)

    def _flush(self, e, t):
        from scipy import stats as sstats
        n = len(self.x[e])
        if n == 0:
            return
        cx, cy, cz, ct = (self.cx[e], self.cy[e], self.cz[e], self.ct[e])
        n_obs, n_for = cx + cy, cx + cz
        cx_rd = (n_obs * n_for) / ct if ct > 0 else math.nan
        bias = 100.0 * n_for / n_obs if n_obs > 0 else math.nan
        pod = 100.0 * cx / n_obs if n_obs > 0 else math.nan
        far = 100.0 * cz / n_for if n_for > 0 else math.nan
        csi = (100.0 * cx / (cx + cy + cz)
               if cx + cy + cz > 0 else math.nan)
        ets = (100.0 * (cx - cx_rd) / (cx + cy + cz - cx_rd)
               if cx + cy + cz - cx_rd > 0 else math.nan)
        xa = np.array(self.x[e])
        ya = np.array(self.y[e])
        with np.errstate(invalid="ignore"):
            rho_p = (np.corrcoef(xa, ya)[0, 1] if n > 1 else math.nan)
            rho_s = (sstats.spearmanr(xa, ya).statistic
                     if n > 1 else math.nan)
        work = xa - ya
        stdn = np.array(self.obsstdn[e])
        work2 = np.where(stdn != 0, work / np.where(stdn != 0, stdn, 1),
                         0.0)
        mean = float(np.mean(work))
        rmse = float(np.sqrt(np.mean(work ** 2)))
        absdev = float(np.mean(np.abs(work)))
        loglik = float(np.sum(work2 ** 2)) * -0.5
        self.out.write(
            "%.2f %d %d %d %d %d %d %g %g %g %g %g %g %g %g %g %g %g %g"
            " %d\n" % (
                t, e if self.ensemble else -999, cx, cy, cz, n_obs,
                n_for, bias, pod, far, csi, cx_rd, ets, rho_p, rho_s,
                mean, rmse, absdev, loglik, n))
        self.out.flush()
        self.ct[e] = self.cx[e] = self.cy[e] = self.cz[e] = 0
        self.x[e] = []
        self.y[e] = []
        self.obsstdn[e] = []

    def close(self):
        self.out.close()


class ProfWriter:
    """Vertical profiles at observation locations (reference
    write_prof, c:14165)."""

    def __init__(self, ctl: Ctl, filename: str):
        if ctl.qnt("m") < 0:
            raise ValueError("Need quantity mass!")
        if ctl.molmass <= 0:
            raise ValueError("Specify molar mass!")
        self.ctl = ctl
        self.rt, self.rz, self.rlon, self.rlat, self.robs = read_obs(
            ctl.prof_obsfile, ctl)
        self.out = open(filename, "w")
        self.out.write(
            "# $1 = time [s]\n# $2 = altitude [km]\n"
            "# $3 = longitude [deg]\n# $4 = latitude [deg]\n"
            "# $5 = pressure [hPa]\n# $6 = temperature [K]\n"
            "# $7 = volume mixing ratio [ppv]\n"
            "# $8 = H2O volume mixing ratio [ppv]\n"
            "# $9 = O3 volume mixing ratio [ppv]\n"
            "# $10 = observed BT index [K]\n"
            "# $11 = number of observations\n")

    def write(self, metbuf, atm: Atm, t: float):
        ctl = self.ctl
        nx, ny, nz = ctl.prof_nx, ctl.prof_ny, ctl.prof_nz
        dz = (ctl.prof_z1 - ctl.prof_z0) / nz
        dlon = (ctl.prof_lon1 - ctl.prof_lon0) / nx
        dlat = (ctl.prof_lat1 - ctl.prof_lat0) / ny
        zc = ctl.prof_z0 + dz * (np.arange(nz) + 0.5)
        pressc = _press(zc)
        lonc = ctl.prof_lon0 + dlon * (np.arange(nx) + 0.5)
        latc = ctl.prof_lat0 + dlat * (np.arange(ny) + 0.5)
        area = (dlat * dlon * (RE * np.pi / 180.0) ** 2
                * np.cos(_D2R * latc))
        t0, t1 = t - 0.5 * ctl.dt_mod, t + 0.5 * ctl.dt_mod

        sel = ((self.rt >= t0) & (self.rt < t1)
               & np.isfinite(self.robs))
        oix = ((self.rlon - ctl.prof_lon0) / dlon).astype(int)
        oiy = ((self.rlat - ctl.prof_lat0) / dlat).astype(int)
        sel &= (oix >= 0) & (oix < nx) & (oiy >= 0) & (oiy < ny)
        oidx = oix * ny + oiy
        obscount = np.bincount(oidx[sel], minlength=nx * ny)
        obssum = np.bincount(oidx[sel], weights=self.robs[sel],
                             minlength=nx * ny)

        time, p, lon, lat, q = _atm_arrays(ctl, atm)
        ok = (time >= t0) & (time <= t1)
        mix = ((lon - ctl.prof_lon0) / dlon).astype(int)
        miy = ((lat - ctl.prof_lat0) / dlat).astype(int)
        miz = ((_z(p) - ctl.prof_z0) / dz).astype(int)
        ok &= ((mix >= 0) & (mix < nx) & (miy >= 0) & (miy < ny)
               & (miz >= 0) & (miz < nz))
        midx = (mix * ny + miy) * nz + miz
        mass = np.bincount(midx[ok], weights=q["m"][ok],
                           minlength=nx * ny * nz)

        for gx in range(nx):
            for gy in range(ny):
                i2 = gx * ny + gy
                if obscount[i2] == 0:
                    continue
                col = mass[i2 * nz:(i2 + 1) * nz]
                if not (col > 0).any():
                    continue
                self.out.write("\n")
                temp = _interp_met_t(metbuf, t, pressc,
                                     np.full(nz, lonc[gx]),
                                     np.full(nz, latc[gy]), "t")
                h2o = _interp_met_t(metbuf, t, pressc,
                                    np.full(nz, lonc[gx]),
                                    np.full(nz, latc[gy]), "h2o")
                o3 = _interp_met_t(metbuf, t, pressc,
                                   np.full(nz, lonc[gx]),
                                   np.full(nz, latc[gy]), "o3")
                for gz in range(nz):
                    vmr = (MA / ctl.molmass * col[gz]
                           / (_rho(pressc[gz], temp[gz]) * area[gy]
                              * dz * 1e9))
                    self.out.write(
                        "%.2f %g %g %g %g %g %g %g %g %g %d\n" % (
                            t, zc[gz], lonc[gx], latc[gy], pressc[gz],
                            temp[gz], vmr, h2o[gz], o3[gz],
                            obssum[i2] / obscount[i2], obscount[i2]))
        self.out.flush()

    def close(self):
        self.out.close()


class SampleWriter:
    """Sample model mass around observation points (reference
    write_sample, c:14395)."""

    def __init__(self, ctl: Ctl, filename: str):
        self.ctl = ctl
        self.rt, self.rz, self.rlon, self.rlat, self.robs = read_obs(
            ctl.sample_obsfile, ctl)
        self.kz = self.kw = None
        if ctl.sample_kernel != "-":
            self.kz, self.kw = read_kernel(ctl.sample_kernel)
        self.out = open(filename, "w")
        self.out.write(
            "# $1 = time [s]\n# $2 = altitude [km]\n"
            "# $3 = longitude [deg]\n# $4 = latitude [deg]\n"
            "# $5 = surface area [km^2]\n# $6 = layer depth [km]\n"
            "# $7 = number of particles [1]\n"
            "# $8 = column density [kg/m^2]\n"
            "# $9 = volume mixing ratio [ppv]\n"
            "# $10 = observed BT index [K]\n\n")
        self.dlat = ctl.sample_dx * 180.0 / (np.pi * RE)
        self.rmax2 = ctl.sample_dx ** 2
        self.area = np.pi * self.rmax2

    def write(self, metbuf, atm: Atm, t: float):
        ctl = self.ctl
        t0, t1 = t - 0.5 * ctl.dt_mod, t + 0.5 * ctl.dt_mod
        sel = np.nonzero((self.rt >= t0) & (self.rt < t1))[0]
        if sel.size == 0:
            return
        time, p, lon, lat, q = _atm_arrays(ctl, atm)
        ok = (time >= t0) & (time <= t1)
        x1 = _geo2cart(lon, lat)
        kern = kernel_weight(self.kz, self.kw, p)
        for i in sel:
            x0 = _geo2cart(self.rlon[i], self.rlat[i])
            rp = _press(self.rz[i])
            hit = ok & (np.abs(self.rlat[i] - lat) <= self.dlat)
            d2 = np.sum((x1 - x0) ** 2, axis=-1)
            hit &= d2 <= self.rmax2
            if ctl.sample_dz > 0:
                ptop = _press(self.rz[i] + ctl.sample_dz)
                pbot = _press(self.rz[i] - ctl.sample_dz)
                hit &= (p <= pbot) & (p >= ptop)
            npts = int(hit.sum())
            mass = (float(np.sum(kern[hit] * q["m"][hit]))
                    if "m" in q else 0.0)
            cd = mass / (1e6 * self.area)
            if ctl.molmass > 0 and ctl.sample_dz > 0:
                vmr = 0.0
                if mass > 0:
                    temp = float(_interp_met_t(
                        metbuf, self.rt[i], np.array([rp]),
                        np.array([self.rlon[i]]),
                        np.array([self.rlat[i]]))[0])
                    vmr = (MA / ctl.molmass * cd
                           / (_rho(rp, temp) * ctl.sample_dz * 1e3))
            else:
                vmr = math.nan
            self.out.write("%.2f %g %g %g %g %g %d %g %g %g\n" % (
                self.rt[i], self.rz[i], self.rlon[i], self.rlat[i],
                self.area, ctl.sample_dz, npts, cd, vmr, self.robs[i]))
        self.out.flush()

    def close(self):
        self.out.close()
