"""Output dispatcher (reference mptrac_write_output,
/root/reference/src/mptrac.c:7919-8009): per-interval file outputs of
particle, grid, ensemble, CSI, profile, sample, station and VTK data."""

from __future__ import annotations

import math
import os

from mptrac_tpu.config import Ctl
from mptrac_tpu.io import atm_io
from mptrac_tpu.timeutil import jsec2time
from mptrac_tpu.types import Atm


def _stamp(t: float) -> str:
    year, mon, day, hour, minute, sec, _ = jsec2time(t)
    return f"{year:04d}_{mon:02d}_{day:02d}_{hour:02d}_{minute:02d}_{sec:02d}"


def write_output(dirname: str, ctl: Ctl, metbuf, atm: Atm, t: float):
    stamp = _stamp(t)

    if ctl.atm_basename != "-" and (
            math.fmod(t, ctl.atm_dt_out) == 0 or t == ctl.t_stop):
        ext = {0: "tab", 1: "bin"}.get(ctl.atm_type_out, "nc")
        fn = os.path.join(dirname, f"{ctl.atm_basename}_{stamp}.{ext}")
        atm_io.write_atm(fn, ctl, atm, t)

    if ctl.grid_basename != "-" and math.fmod(t, ctl.grid_dt_out) == 0:
        from mptrac_tpu.io.grid import write_grid
        ext = "tab" if ctl.grid_type == 0 else "nc"
        fn = os.path.join(dirname, f"{ctl.grid_basename}_{stamp}.{ext}")
        write_grid(fn, ctl, metbuf, atm, t)

    if ctl.csi_basename != "-":
        from mptrac_tpu.io.csi import write_csi
        fn = os.path.join(dirname, f"{ctl.csi_basename}.tab")
        write_csi(fn, ctl, atm, t)

    if ctl.ens_basename != "-" and math.fmod(t, ctl.ens_dt_out) == 0:
        from mptrac_tpu.io.ens import write_ens
        fn = os.path.join(dirname, f"{ctl.ens_basename}_{stamp}.tab")
        write_ens(fn, ctl, atm, t)

    if ctl.prof_basename != "-":
        from mptrac_tpu.io.prof import write_prof
        fn = os.path.join(dirname, f"{ctl.prof_basename}.tab")
        write_prof(fn, ctl, metbuf, atm, t)

    if ctl.sample_basename != "-":
        from mptrac_tpu.io.sample import write_sample
        fn = os.path.join(dirname, f"{ctl.sample_basename}.tab")
        write_sample(fn, ctl, metbuf, atm, t)

    if ctl.stat_basename != "-":
        from mptrac_tpu.io.station import write_station
        fn = os.path.join(dirname, f"{ctl.stat_basename}.tab")
        write_station(fn, ctl, atm, t)

    if ctl.vtk_basename != "-" and math.fmod(t, ctl.vtk_dt_out) == 0:
        from mptrac_tpu.io.vtk import write_vtk
        if not hasattr(write_output, "_nvtk") or t == ctl.t_start:
            write_output._nvtk = 0
        write_output._nvtk += 1
        fn = os.path.join(
            dirname, f"{ctl.vtk_basename}_{write_output._nvtk:05d}.vtk")
        write_vtk(fn, ctl, atm, t)
