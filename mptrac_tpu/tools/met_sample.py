"""met_sample — sample meteo data at given points
(reference /root/reference/src/met_sample.c).

Usage: python -m mptrac_tpu.tools.met_sample <ctl> <sample.tab>
       <atm_in> [KEY VALUE ...]

Reads points (time, z, lon, lat) from an atm file and samples the
standard variable record with full 4-D (two-snapshot) interpolation.
"""

from __future__ import annotations

import sys

import numpy as np

from mptrac_tpu.climatology import read_clim
from mptrac_tpu.config import read_ctl
from mptrac_tpu.constants import H0, P0
from mptrac_tpu.io.atm_io import read_atm
from mptrac_tpu.sim import MetBuffer
from mptrac_tpu.tools._cli import require_args, run_tool
from mptrac_tpu.tools._met_sample import (MET_HEADER, record_columns,
                                          sample_met)


def main(argv):
    require_args(argv, 4, "met_sample <ctl> <sample.tab> <atm_in>")
    ctl = read_ctl(argv[1], argv[2:])
    clim = read_clim(ctl)
    atm = read_atm(argv[3], ctl)
    n = int(atm.np)
    time = np.asarray(atm.time)[:n]
    p = np.asarray(atm.p)[:n]
    lon = np.asarray(atm.lon)[:n]
    lat = np.asarray(atm.lat)[:n]

    metbuf = MetBuffer(ctl.replace(t_start=float(time.min()),
                                   t_stop=float(time.max()) + 1), clim)
    with open(argv[2], "w") as out:
        out.write(MET_HEADER)
        out.write("\n")
        for i in range(n):
            pair = metbuf.get(time[i])
            # time interpolation: sample both snapshots and lerp
            from mptrac_tpu.types import Met
            import jax
            m0 = jax.tree.map(lambda x: x[0], pair)
            m1 = jax.tree.map(lambda x: x[1], pair)
            s0 = sample_met(ctl, clim, m0, p[i:i + 1], lon[i:i + 1],
                            lat[i:i + 1])
            s1 = sample_met(ctl, clim, m1, p[i:i + 1], lon[i:i + 1],
                            lat[i:i + 1])
            wt = ((float(m1.time) - time[i])
                  / (float(m1.time) - float(m0.time))
                  if float(m1.time) != float(m0.time) else 1.0)
            smp = {k: float(wt * (s0[k][0] - s1[k][0]) + s1[k][0])
                   for k in s0}
            cols = record_columns(time[i], H0 * np.log(P0 / p[i]),
                                  lon[i], lat[i], p[i], smp)
            out.write("%.2f " % cols[0]
                      + " ".join("%g" % c for c in cols[1:52])
                      + " 1 1 1\n")
    return 0


if __name__ == "__main__":
    sys.exit(run_tool(main))
