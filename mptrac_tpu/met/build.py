"""Met snapshot assembly: read + preprocess -> Met.

Orchestrates the reference ``mptrac_read_met`` chain
(/root/reference/src/mptrac.c:7436-7545) on the host and uploads the
finished fields to device arrays.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from mptrac_tpu.config import Ctl
from mptrac_tpu.types import Met, _axis_is_arithmetic


def interp_columns_at(field3, lon, lat, p, ptarget, coord_type=0):
    """Sample a 3-D field at per-column target pressures on its own
    grid points (used for tropopause diagnostics, reference
    c:11983-12006: intpol_met_space_3d at every (lon[ix], lat[iy])).

    On grid points the horizontal weights are exactly 1, so this is a
    pure vertical interpolation in the reference weight convention.
    """
    f = field3.astype(np.float64)
    pt = ptarget.astype(np.float64)
    npl = p.size
    # reference locate_irr on descending p
    if p[1] > p[0]:
        iz = np.clip(np.searchsorted(p, pt, side="right") - 1, 0, npl - 2)
    else:
        iz = np.clip(np.searchsorted(-p, -pt, side="left") - 1, 0, npl - 2)
    iz = np.where(np.isfinite(pt), iz, 0).astype(np.int64)
    wz = (p[iz + 1] - pt) / (p[iz + 1] - p[iz])
    lo = np.take_along_axis(f, iz[..., None], -1)[..., 0]
    hi = np.take_along_axis(f, iz[..., None] + 1, -1)[..., 0]
    out = wz * (lo - hi) + hi
    return np.where(np.isfinite(pt), out, np.nan).astype(np.float32)


def read_met(filename: str, ctl: Ctl, clim=None, sel=None) -> Met:
    """Read one meteo file and run the preprocessing chain
    (reference mptrac_read_met, c:7436).  ``sel`` restricts netCDF
    reads to a horizontal hyperslab (domain-decomposition tiles)."""
    from mptrac_tpu.met import process
    from mptrac_tpu.met.read_nc import read_met_nc

    if ctl.met_type == 0:
        raw = read_met_nc(filename, ctl, sel=sel)
    elif ctl.met_type in (1, 2, 3, 4, 5, 7, 8):
        from mptrac_tpu.met.bin_io import read_met_bin
        raw = read_met_bin(filename, ctl)
    elif ctl.met_type == 6:
        from mptrac_tpu.met.read_grib import read_met_grib
        raw = read_met_grib(filename, ctl)
    else:
        raise NotImplementedError(
            f"MET_TYPE {ctl.met_type} not implemented yet")
    lon = raw["lon"]
    lat = raw["lat"]
    p = raw["p"]
    f2: Dict[str, np.ndarray] = raw["fields2d"]
    f3: Dict[str, np.ndarray] = raw["fields3d"]

    if p[0] < p[-1] and not (ctl.met_type in (0, 6)
                             and ctl.met_vert_coord != 0):
        # Model-level input (met_vert_coord != 0): the level variable
        # is an index; the pressure axis comes from ml2pl below.
        raise ValueError("Pressure levels must be descending!")

    if ctl.met_type not in (0, 6):
        # Binary containers store fully preprocessed fields
        # (reference c:7481 applies the chain to nc/grib only)
        return _to_met(ctl, raw, lon, lat, p, f2, f3)

    # Model-level handling: compute pl and interpolate to target
    # pressure levels (reference read_met_nc_levels, c:9740-9835)
    target_p = None
    if ctl.met_np > 0 or ctl.met_press_level_def >= 0:
        if ctl.met_press_level_def >= 0:
            target_p = process.level_definitions(ctl.met_press_level_def)
        else:
            target_p = np.asarray(ctl.met_p)
    if target_p is not None and "pl" in f3 and np.any(f3["pl"]):
        process.monotonize(ctl, raw["hybrid"], f3)
        process.ml2pl(ctl, f3, target_p)
        p = target_p
    elif target_p is not None and raw.get("npl_ml", 0) == 0:
        # pressure-level input resampled onto the target levels is a
        # no-op unless model-level pressure is available
        pass

    # Preprocessing chain in reference order (c:7480-7530)
    process.extrapolate(f3)
    process.polar_winds(lon, lat, f3, ctl.met_coord_type)
    if ctl.met_coord_type == 0:
        nlon0 = len(lon)
        lon, f2, f3 = process.periodic(lon, f2, f3)
        raw["lon_periodic"] = len(lon) != nlon0
    lon, lat, p, f2, f3 = process.sample_grid(ctl, lon, lat, p, f2, f3)
    process.geopot(ctl, lon, lat, p, f2, f3)
    process.pv(lon, lat, p, f3, ctl.met_coord_type)
    process.pbl(ctl, lon, lat, p, f2, f3)
    process.tropopause(ctl, clim, raw["time"], lon, lat, p, f2, f3)
    process.cloud(lon, lat, p, f2, f3)
    if ctl.met_cape == 1:
        from mptrac_tpu.met.cape import compute_cape
        compute_cape(ctl, raw["time"], lon, lat, p, f2, f3)
    process.ozone_column(p, f2, f3)
    process.detrend(ctl, lon, lat, p, f3)
    if raw.get("npl_ml", 0) and ctl.advect_vert_coord == 1:
        process.monotonize(ctl, raw["hybrid"], f3)

    _log_ranges(filename, raw, lon, lat, p, f2, f3)
    return _to_met(ctl, raw, lon, lat, p, f2, f3)


def _log_ranges(filename, raw, lon, lat, p, f2, f3):
    """Met data-range logging at LOGLEV >= 2 (reference read_met grid
    and variable logs, c:9448-9456 and the per-variable LOG(2) lines of
    read_met_nc_2d/3d, c:12110-12182-style ranges)."""
    from mptrac_tpu.utils.log import LOG, get_level
    if get_level() < 2:
        return
    LOG(2, "Read meteo data: %s", filename)
    LOG(2, "Time: %.2f", float(raw["time"]))
    LOG(2, "Grid: %d x %d x %d "
        "(lon %g ... %g, lat %g ... %g, p %g ... %g hPa)",
        lon.size, lat.size, p.size, lon[0], lon[-1], lat[0], lat[-1],
        p[0], p[-1])
    for name in ("t", "u", "v", "w", "h2o", "o3"):
        a = f3.get(name)
        if a is not None and np.isfinite(a).any():
            LOG(2, "%s range: %g ... %g", name,
                np.nanmin(a), np.nanmax(a))
    ps = f2.get("ps")
    if ps is not None and np.isfinite(ps).any():
        LOG(2, "ps range: %g ... %g hPa", np.nanmin(ps), np.nanmax(ps))


def _to_met(ctl: Ctl, raw, lon, lat, p, f2, f3) -> Met:
    return Met(
        time=jnp.asarray(float(raw["time"])),
        lon=jnp.asarray(lon, jnp.float64),
        lat=jnp.asarray(lat, jnp.float64),
        p=jnp.asarray(p, jnp.float64),
        hybrid=jnp.asarray(raw["hybrid"], jnp.float64),
        fields2d={k: jnp.asarray(v, jnp.float32) for k, v in f2.items()},
        fields3d={k: jnp.asarray(v, jnp.float32) for k, v in f3.items()},
        coord_type=ctl.met_coord_type,
        npl_ml=raw["npl_ml"],
        reg_lon=_axis_is_arithmetic(lon),
        reg_lat=_axis_is_arithmetic(lat),
        lon_periodic=bool(raw.get("lon_periodic", False)),
    )
