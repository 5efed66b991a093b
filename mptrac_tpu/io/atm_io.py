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
    mptrac_read_atm, c:6331)."""
    if ctl.atm_type == 0:
        return read_atm_asc(filename, ctl, npmax, dtype)
    if ctl.atm_type == 1:
        return read_atm_bin(filename, ctl, npmax, dtype)
    raise NotImplementedError(f"ATM_TYPE {ctl.atm_type}")


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
    """Dispatch on ATM_TYPE_OUT (reference mptrac_write_atm, c:7806)."""
    if ctl.atm_type_out == 0:
        write_atm_asc(filename, ctl, atm, t)
    elif ctl.atm_type_out == 1:
        write_atm_bin(filename, ctl, atm)
    else:
        raise NotImplementedError(f"ATM_TYPE_OUT {ctl.atm_type_out}")


def write_atm_asc(filename: str, ctl: Ctl, atm: Atm, t: float) -> None:
    """ASCII particle table (reference write_atm_asc, c:12450),
    byte-compatible with the reference format."""
    n = int(atm.np)
    time = np.asarray(atm.time)[:n]
    p = np.asarray(atm.p)[:n]
    lon = np.asarray(atm.lon)[:n]
    lat = np.asarray(atm.lat)[:n]
    qs = [np.asarray(atm.q[name])[:n] for name in ctl.qnt_name]
    z = H0 * np.log(P0 / p)

    t0 = t - 0.5 * ctl.dt_mod
    t1 = t + 0.5 * ctl.dt_mod

    with open(filename, "w") as out:
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
