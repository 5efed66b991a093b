"""Particle data I/O: ASCII / binary / netCDF atm files.

Reference: read_atm_asc (/root/reference/src/mptrac.c:8056), write_atm_asc
(c:12450), read/write_atm_bin (c:8097, 12546), read/write_atm_nc.
ASCII format: columns ``time z[km] lon lat q...`` (z converted to
pressure via the barometric formula on read).
"""

from __future__ import annotations

import math
import struct
from typing import Optional

import jax.numpy as jnp
import numpy as np

from mptrac_tpu.config import Ctl
from mptrac_tpu.constants import H0, P0
from mptrac_tpu.types import Atm


def read_atm(filename: str, ctl: Ctl, npmax: Optional[int] = None,
             dtype=jnp.float64) -> Atm:
    """Read an atm file, dispatching on ATM_TYPE (reference
    mptrac_read_atm, c:6331): 0 ASCII, 1 binary, 2 netCDF,
    3/4 CLaMS."""
    if ctl.atm_type == 0:
        return read_atm_asc(filename, ctl, npmax, dtype)
    if ctl.atm_type == 1:
        return read_atm_bin(filename, ctl, npmax, dtype)
    if ctl.atm_type == 2:
        return read_atm_nc(filename, ctl, npmax, dtype)
    if ctl.atm_type in (3, 4):
        return read_atm_clams(filename, ctl, npmax, dtype)
    raise NotImplementedError(f"ATM_TYPE {ctl.atm_type}")


def _pad_arrays(npmax, n, dtype, cols):
    import numpy as _np

    def pad(col):
        out = _np.zeros(npmax)
        out[:n] = col
        return jnp.asarray(out, dtype)
    return [pad(c) for c in cols]


def read_atm_nc(filename: str, ctl: Ctl, npmax=None,
                dtype=jnp.float64) -> Atm:
    """netCDF particle file with an ``obs`` dimension (reference
    read_atm_nc, c:8217)."""
    from mptrac_tpu.io.hdf5 import open_netcdf_any
    v, nc = open_netcdf_any(filename)
    try:
        time = np.array(v["time"][:], np.float64)
        p = np.array(v["press"][:], np.float64)
        lon = np.array(v["lon"][:], np.float64)
        lat = np.array(v["lat"][:], np.float64)
        n = time.size
        npmax = npmax or n
        cols = _pad_arrays(npmax, n, dtype, [time, p, lon, lat])
        q = {}
        for name in ctl.qnt_name:
            if name in v:
                q[name] = _pad_arrays(
                    npmax, n, dtype,
                    [np.array(v[name][:], np.float64)])[0]
            else:
                q[name] = jnp.zeros(npmax, dtype)
        return Atm(time=cols[0], p=cols[1], lon=cols[2], lat=cols[3],
                   q=q, np=jnp.asarray(n, jnp.int32))
    finally:
        if hasattr(nc, "close"):
            nc.close()


def read_atm_clams(filename: str, ctl: Ctl, npmax=None,
                   dtype=jnp.float64) -> Atm:
    """CLaMS particle file with an ``NPARTS`` dimension (reference
    read_atm_clams, c:8154)."""
    from mptrac_tpu.io.hdf5 import open_netcdf_any
    v, nc = open_netcdf_any(filename)
    try:
        lon = np.array(v["LON"][:], np.float64).ravel()
        lat = np.array(v["LAT"][:], np.float64).ravel()
        n = lon.size
        if "TIME_INIT" in v:
            time = np.array(v["TIME_INIT"][:], np.float64).ravel()
        else:
            time = np.full(n, float(np.array(v["time"][:]).ravel()[0]))
        q = {}
        if ctl.advect_vert_coord == 1:
            zeta = np.array(v["ZETA"][:], np.float64).ravel()
            p = (np.array(v["PRESS"][:], np.float64).ravel()
                 if "PRESS" in v else np.full(n, 500.0))
            if "zeta" in ctl.qnt_name:
                q["zeta"] = zeta
        else:
            key = "PRESS_INIT" if "PRESS_INIT" in v else "PRESS"
            p = np.array(v[key][:], np.float64).ravel()
        npmax = npmax or n
        cols = _pad_arrays(npmax, n, dtype, [time, p, lon, lat])
        qq = {}
        for name in ctl.qnt_name:
            if name in q:
                qq[name] = _pad_arrays(npmax, n, dtype, [q[name]])[0]
            elif name in v:
                qq[name] = _pad_arrays(
                    npmax, n, dtype,
                    [np.array(v[name][:], np.float64).ravel()])[0]
            else:
                qq[name] = jnp.zeros(npmax, dtype)
        return Atm(time=cols[0], p=cols[1], lon=cols[2], lat=cols[3],
                   q=qq, np=jnp.asarray(n, jnp.int32))
    finally:
        if hasattr(nc, "close"):
            nc.close()


def read_atm_asc(filename: str, ctl: Ctl, npmax=None,
                 dtype=jnp.float64) -> Atm:
    rows = []
    with open(filename) as f:
        for line in f:
            toks = line.split()
            if len(toks) < 4:
                continue
            try:
                vals = [float(x) for x in toks[:4 + ctl.nq]]
            except ValueError:
                continue
            rows.append(vals)
    if not rows:
        raise ValueError(f"No air parcels in {filename}")
    data = np.array(rows, np.float64)
    n = data.shape[0]
    npmax = npmax or n
    atm = Atm.zeros(npmax, ctl.qnt_name, dtype)

    def pad(col):
        out = np.zeros(npmax)
        out[:n] = col
        return jnp.asarray(out, dtype)

    q = {name: pad(data[:, 4 + iq]) if data.shape[1] > 4 + iq
         else jnp.zeros(npmax, dtype)
         for iq, name in enumerate(ctl.qnt_name)}
    return atm.replace(
        time=pad(data[:, 0]),
        p=pad(P0 * np.exp(-data[:, 1] / H0)),
        lon=pad(data[:, 2]),
        lat=pad(data[:, 3]),
        q=q,
        np=jnp.asarray(n, jnp.int32))


def read_atm_bin(filename: str, ctl: Ctl, npmax=None,
                 dtype=jnp.float64) -> Atm:
    """Binary atm container, version 100 (reference read_atm_bin,
    c:8097)."""
    with open(filename, "rb") as f:
        version, = struct.unpack("<i", f.read(4))
        if version != 100:
            raise ValueError("Wrong version of binary data!")
        n, = struct.unpack("<i", f.read(4))
        def arr():
            return np.frombuffer(f.read(8 * n), "<f8")
        time = arr()
        p = arr()
        lon = arr()
        lat = arr()
        q = {}
        for name in ctl.qnt_name:
            q[name] = arr()
        final, = struct.unpack("<i", f.read(4))
        if final != 999:
            raise ValueError("Error while reading binary data!")
    npmax = npmax or n
    def pad(col):
        out = np.zeros(npmax)
        out[:n] = col
        return jnp.asarray(out, dtype)
    return Atm(
        time=pad(time), p=pad(p), lon=pad(lon), lat=pad(lat),
        q={k: pad(v) for k, v in q.items()},
        np=jnp.asarray(n, jnp.int32))


def _fmt_g(x: float) -> str:
    """C printf %g formatting."""
    return "%g" % x


def write_atm(filename: str, ctl: Ctl, atm: Atm, t: float) -> None:
    """Dispatch on ATM_TYPE_OUT (reference mptrac_write_atm, c:7806):
    0 ASCII, 1 binary, 2 netCDF, 3 CLaMS trajectory, 4 CLaMS pos."""
    if ctl.atm_type_out == 0:
        write_atm_asc(filename, ctl, atm, t)
    elif ctl.atm_type_out == 1:
        write_atm_bin(filename, ctl, atm)
    elif ctl.atm_type_out == 2:
        write_atm_nc(filename, ctl, atm)
    elif ctl.atm_type_out in (3, 4):
        write_atm_clams(filename, ctl, atm)
    else:
        raise NotImplementedError(f"ATM_TYPE_OUT {ctl.atm_type_out}")


def write_atm_nc(filename: str, ctl: Ctl, atm: Atm) -> None:
    """netCDF particle file (reference write_atm_nc, c:12815)."""
    from scipy.io import netcdf_file
    n = int(atm.np)
    nc = netcdf_file(filename, "w")
    try:
        nc.createDimension("obs", n)
        for name, data, unit in (
                ("time", np.asarray(atm.time)[:n],
                 b"seconds since 2000-01-01 00:00:00 UTC"),
                ("press", np.asarray(atm.p)[:n], b"hPa"),
                ("lon", np.asarray(atm.lon)[:n], b"degrees_east"),
                ("lat", np.asarray(atm.lat)[:n], b"degrees_north")):
            v = nc.createVariable(name, "d", ("obs",))
            v[:] = data
            v.units = unit
        for iq, name in enumerate(ctl.qnt_name):
            v = nc.createVariable(name, "d", ("obs",))
            v[:] = np.asarray(atm.q[name])[:n]
            v.units = ctl.qnt_unit[iq].encode()
        nc.featureType = b"point"
    finally:
        nc.close()


def write_atm_clams(filename: str, ctl: Ctl, atm: Atm) -> None:
    """CLaMS position file (reference write_atm_clams, c:12598)."""
    from scipy.io import netcdf_file
    n = int(atm.np)
    nc = netcdf_file(filename, "w")
    try:
        nc.createDimension("time", 1)
        nc.createDimension("NPARTS", n)
        v = nc.createVariable("time", "d", ("time",))
        v[:] = [float(np.asarray(atm.time)[0]) if n else 0.0]
        for name, data in (("LAT", np.asarray(atm.lat)[:n]),
                           ("LON", np.asarray(atm.lon)[:n]),
                           ("PRESS", np.asarray(atm.p)[:n])):
            vv = nc.createVariable(name, "d", ("NPARTS",))
            vv[:] = data
        zeta = (np.asarray(atm.q["zeta"])[:n] if "zeta" in atm.q
                else np.zeros(n))
        vz = nc.createVariable("ZETA", "d", ("NPARTS",))
        vz[:] = zeta
        for name in ctl.qnt_name:
            if name == "zeta":
                continue
            vv = nc.createVariable(name, "d", ("NPARTS",))
            vv[:] = np.asarray(atm.q[name])[:n]
        nc.exp_VERTCOOR_name = b"zeta"
        nc.model = b"MPTRAC"
    finally:
        nc.close()


def _gnuplot_pipe(gpfile: str, filename: str, t: float):
    """Open a pipe into gnuplot with the reference's prelude: output
    PNG name + timestr variable + the user's plot script
    (write_atm_asc gnuplot branch, c:12462-12486)."""
    import subprocess

    from mptrac_tpu.timeutil import jsec2time

    try:
        proc = subprocess.Popen(["gnuplot"], stdin=subprocess.PIPE,
                                text=True)
    except FileNotFoundError:
        raise RuntimeError("Cannot create pipe to gnuplot!")
    year, mon, day, hour, minute, _, _ = jsec2time(t)
    proc.stdin.write(f'set out "{filename}.png"\n')
    proc.stdin.write(f'timestr="{year}-{mon:02d}-{day:02d}, '
                     f'{hour:02d}:{minute:02d} UTC"\n')
    with open(gpfile) as f:
        proc.stdin.write(f.read())
    return proc


class _PipeCtx:
    def __init__(self, proc):
        self.proc = proc

    def __enter__(self):
        return self.proc.stdin

    def __exit__(self, *exc):
        self.proc.stdin.close()
        self.proc.wait()
        return False


def write_atm_asc(filename: str, ctl: Ctl, atm: Atm, t: float) -> None:
    """ASCII particle table (reference write_atm_asc, c:12450),
    byte-compatible with the reference format.  With ATM_GPFILE set,
    the table is piped into gnuplot instead (c:12462)."""
    n = int(atm.np)
    time = np.asarray(atm.time)[:n]
    p = np.asarray(atm.p)[:n]
    lon = np.asarray(atm.lon)[:n]
    lat = np.asarray(atm.lat)[:n]
    qs = [np.asarray(atm.q[name])[:n] for name in ctl.qnt_name]
    z = H0 * np.log(P0 / p)

    t0 = t - 0.5 * ctl.dt_mod
    t1 = t + 0.5 * ctl.dt_mod

    if ctl.atm_gpfile != "-":
        sink = _PipeCtx(_gnuplot_pipe(ctl.atm_gpfile, filename, t))
    else:
        sink = open(filename, "w")
    with sink as out:
        if ctl.met_coord_type == 0:
            out.write("# $1 = time [s]\n# $2 = altitude [km]\n"
                      "# $3 = longitude [deg]\n# $4 = latitude [deg]\n")
        else:
            out.write("# $1 = time [s]\n# $2 = altitude [km]\n"
                      "# $3 = x [m]\n# $4 = y [m]\n")
        for iq in range(ctl.nq):
            out.write(f"# ${iq + 5} = {ctl.qnt_name[iq]} "
                      f"[{ctl.qnt_unit[iq]}]\n")
        out.write("\n")
        for ip in range(0, n, ctl.atm_stride):
            if ctl.atm_filter == 2 and (time[ip] < t0 or time[ip] > t1):
                continue
            if ctl.met_coord_type == 0:
                out.write("%.2f %g %g %g" % (time[ip], z[ip],
                                             lon[ip], lat[ip]))
            else:
                out.write("%.2f %g %.2f %.2f" % (time[ip], z[ip],
                                                 lon[ip], lat[ip]))
            for iq in range(ctl.nq):
                val = qs[iq][ip]
                if ctl.atm_filter == 1 and (time[ip] < t0 or time[ip] > t1):
                    val = math.nan
                out.write(" " + ctl.qnt_format[iq] % val)
            out.write("\n")


def write_atm_bin(filename: str, ctl: Ctl, atm: Atm) -> None:
    """Binary atm container version 100 (reference write_atm_bin,
    c:12546)."""
    n = int(atm.np)
    with open(filename, "wb") as out:
        out.write(struct.pack("<i", 100))
        out.write(struct.pack("<i", n))
        for arrname in ("time", "p", "lon", "lat"):
            np.asarray(getattr(atm, arrname))[:n].astype(
                "<f8").tofile(out)
        for name in ctl.qnt_name:
            np.asarray(atm.q[name])[:n].astype("<f8").tofile(out)
        out.write(struct.pack("<i", 999))
