"""Chemistry modules: chemistry grid, OH / H2O2 / tracer chemistry.

Reference: module_chem_grid (/root/reference/src/mptrac.c:3885-4050),
module_chem_init (c:4050-4094), module_oh_chem (c:5335-5419),
module_h2o2_chem (c:4793-4878), module_tracer_chem (c:5889-5963),
clim_oh (c:89-124), cos_sza (c:1857), clim_photo (c:156-213).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mptrac_tpu import climatology as cl
from mptrac_tpu.config import Ctl
from mptrac_tpu.constants import AVO, MA, RE, RI
from mptrac_tpu.ops import interp
from mptrac_tpu.ops.interp import locate_irr, locate_reg
from mptrac_tpu.ops.thermo import deg2rad, rho as rho_air, theta
from mptrac_tpu.physics.mixing import grid_indices
from mptrac_tpu.types import Atm, Cache, Clim, Met


def molec_dens(p, t):
    """Molecular density [molec/cm^3] (reference MOLEC_DENS macro,
    mptrac.h:1284): AVO * 1e-6 * (p*100) / (RI * t)."""
    return AVO * 1e-6 * (p * 100.0) / (RI * t)


def cos_sza(sec, lon, lat):
    """Cosine of the solar zenith angle (reference cos_sza, c:1857)."""
    D = sec / 86400.0 - 0.5
    g = deg2rad(357.529 + 0.98560028 * D)
    q = 280.459 + 0.98564736 * D
    L = deg2rad(q + 1.915 * jnp.sin(g) + 0.020 * jnp.sin(2 * g))
    e = deg2rad(23.439 - 0.00000036 * D)
    sindec = jnp.sin(e) * jnp.sin(L)
    ra = jnp.arctan2(jnp.cos(e) * jnp.sin(L), jnp.cos(L))
    GMST = 18.697374558 + 24.06570982441908 * D
    LST = GMST + lon / 15.0
    h = LST / 12.0 * jnp.pi - ra
    lat_r = deg2rad(lat)
    return (jnp.sin(lat_r) * sindec
            + jnp.cos(lat_r) * jnp.sqrt(1.0 - sindec * sindec)
            * jnp.cos(h))


def clim_oh(ctl: Ctl, clim: Clim, t, lon, lat, p):
    """OH climatology with optional diurnal SZA correction
    (reference clim_oh, c:89)."""
    if ctl.met_coord_type == 0:
        lat_ref, lon_ref = lat, lon
    else:
        lat_ref = jnp.full_like(lat, ctl.met_utm_ref_lat)
        lon_ref = jnp.full_like(lon, ctl.met_utm_ref_lon)
    lon_ref = (lon_ref + 180.0) % 360.0 - 180.0
    oh = cl.clim_zm(clim.zm["oh"], t, lat_ref, p)
    if ctl.oh_chem_beta <= 0:
        return oh
    csza_thresh = jnp.cos(deg2rad(85.0))
    csza = cos_sza(t, lon_ref, lat_ref)
    denom = jnp.maximum(csza, csza_thresh)
    return oh * jnp.exp(-ctl.oh_chem_beta / denom)


def clim_photo(rate, clim: Clim, p, sza, o3c):
    """Photolysis-rate table lookup [1/s] (reference clim_photo,
    c:156): trilinear in (p, sza, o3c) with range clamping."""
    pp = jnp.clip(p, jnp.minimum(clim.photo_p[0], clim.photo_p[-1]),
                  jnp.maximum(clim.photo_p[0], clim.photo_p[-1]))
    sz = jnp.clip(sza, clim.photo_sza[0], clim.photo_sza[-1])
    oc = jnp.clip(o3c, clim.photo_o3c[0], clim.photo_o3c[-1])
    ip = locate_irr(clim.photo_p, pp)
    isza = locate_reg(clim.photo_sza, sz)
    io3c = locate_reg(clim.photo_o3c, oc)

    def lin(x0, y0, x1, y1, x):
        return y0 + (y1 - y0) / (x1 - x0) * (x - x0)

    p0, p1 = clim.photo_p[ip], clim.photo_p[ip + 1]
    aux00 = lin(p0, rate[ip, isza, io3c], p1, rate[ip + 1, isza, io3c], pp)
    aux01 = lin(p0, rate[ip, isza, io3c + 1], p1,
                rate[ip + 1, isza, io3c + 1], pp)
    aux10 = lin(p0, rate[ip, isza + 1, io3c], p1,
                rate[ip + 1, isza + 1, io3c], pp)
    aux11 = lin(p0, rate[ip, isza + 1, io3c + 1], p1,
                rate[ip + 1, isza + 1, io3c + 1], pp)
    o0, o1 = clim.photo_o3c[io3c], clim.photo_o3c[io3c + 1]
    aux0 = lin(o0, aux00, o1, aux01, oc)
    aux1 = lin(o0, aux10, o1, aux11, oc)
    s0, s1 = clim.photo_sza[isza], clim.photo_sza[isza + 1]
    return jnp.maximum(lin(s0, aux0, s1, aux1, sz), 0.0)


def module_chem_init(ctl: Ctl, clim: Clim, met01: Met, atm: Atm) -> Atm:
    """Initialize chemistry quantities from met + climatology
    (reference module_chem_init, c:4050)."""
    q = dict(atm.q)
    loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
    if "Ch2o" in q:
        q["Ch2o"] = interp.interp_time_3d(met01, "h2o", atm.time, loc)
    if "Co3" in q:
        q["Co3"] = interp.interp_time_3d(met01, "o3", atm.time, loc)
    lat_ref = (atm.lat if ctl.met_coord_type == 0
               else jnp.full_like(atm.lat, ctl.met_utm_ref_lat))
    if "Coh" in q and "oh" in clim.zm:
        q["Coh"] = clim_oh(ctl, clim, atm.time, atm.lon, atm.lat, atm.p)
    if "Cho2" in q and "ho2" in clim.zm:
        q["Cho2"] = cl.clim_zm(clim.zm["ho2"], atm.time, lat_ref, atm.p)
    if "Ch2o2" in q and "h2o2" in clim.zm:
        q["Ch2o2"] = cl.clim_zm(clim.zm["h2o2"], atm.time, lat_ref, atm.p)
    if "Co1d" in q and "o1d" in clim.zm:
        q["Co1d"] = cl.clim_zm(clim.zm["o1d"], atm.time, lat_ref, atm.p)
    return atm.replace(q=q)


def module_chem_grid(ctl: Ctl, met01: Met, atm: Atm, t) -> Atm:
    """Compute per-grid-box implicit volume mixing ratio Cx from binned
    mass + temperature (reference module_chem_grid, c:3885)."""
    if "m" not in atm.q or "Cx" not in atm.q:
        return atm
    if ctl.molmass <= 0:
        raise ValueError("Molar mass is not defined!")

    ix, iy, iz, ok = grid_indices(ctl, atm, t, "chemgrid")
    nx, ny, nz = ctl.chemgrid_nx, ctl.chemgrid_ny, ctl.chemgrid_nz
    ngrid = nx * ny * nz
    use_ens = ctl.nens > 0
    nens = ctl.nens if use_ens else 1

    idx = (ix * ny + iy) * nz + iz
    if use_ens:
        idx = idx + atm.q["ens"].astype(jnp.int32) * ngrid
    idx_s = jnp.where(ok, idx, ngrid * nens)
    mass = jax.ops.segment_sum(jnp.where(ok, atm.q["m"], 0.0), idx_s,
                               num_segments=ngrid * nens + 1)

    dz = (ctl.chemgrid_z1 - ctl.chemgrid_z0) / nz
    dlon = (ctl.chemgrid_lon1 - ctl.chemgrid_lon0) / nx
    dlat = (ctl.chemgrid_lat1 - ctl.chemgrid_lat0) / ny
    zc = ctl.chemgrid_z0 + dz * (iz + 0.5)
    from mptrac_tpu.ops.thermo import pressure
    pc = pressure(zc)
    lonc = ctl.chemgrid_lon0 + dlon * (ix + 0.5)
    latc = ctl.chemgrid_lat0 + dlat * (iy + 0.5)
    area = (dlat * dlon * (RE * jnp.pi / 180.0) ** 2
            * jnp.cos(deg2rad(latc)))

    loc = interp.locate_3d(met01, lonc, latc, pc)
    temp = interp.interp_time_3d(
        met01, "t", jnp.full_like(atm.time, t), loc)

    m = mass[idx_s]
    cx = MA / ctl.molmass * m / (rho_air(pc, temp) * area * dz * 1e9)
    q = dict(atm.q)
    q["Cx"] = jnp.where(ok, cx, q["Cx"])
    return atm.replace(q=q)


def _apply_loss(atm: Atm, cache: Cache, rate_coef, mloss_key=None):
    """Common exponential-loss update of m/vmr with bookkeeping."""
    active = (cache.dt != 0.0) & atm.mask
    aux = jnp.exp(-cache.dt * rate_coef)
    q = dict(atm.q)
    if "m" in q:
        if mloss_key and mloss_key in q:
            q[mloss_key] = jnp.where(
                active, q[mloss_key] + q["m"] * (1.0 - aux), q[mloss_key])
        q["m"] = jnp.where(active, q["m"] * aux, q["m"])
        if "loss_rate" in q:
            q["loss_rate"] = jnp.where(active, q["loss_rate"] + rate_coef,
                                       q["loss_rate"])
    if "vmr" in q:
        q["vmr"] = jnp.where(active, q["vmr"] * aux, q["vmr"])
    return atm.replace(q=q)


def module_oh_chem(ctl: Ctl, cache: Cache, clim: Clim, met01: Met,
                   atm: Atm) -> Atm:
    """OH loss chemistry, JPL 19-05 rates (reference c:5335)."""
    if "m" not in atm.q and "vmr" not in atm.q:
        raise ValueError(
            "Module needs quantity mass or volume mixing ratio!")
    loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
    t = interp.interp_time_3d(met01, "t", atm.time, loc)
    M = molec_dens(atm.p, t)

    if ctl.oh_chem_reaction == 1:
        k = ctl.oh_chem[0]
    elif ctl.oh_chem_reaction == 2:
        k = ctl.oh_chem[0] * jnp.exp(-ctl.oh_chem[1] / t)
    elif ctl.oh_chem_reaction == 3:
        k0 = ctl.oh_chem[0] * ((298.0 / t) ** ctl.oh_chem[1]
                               if ctl.oh_chem[1] != 0 else 1.0)
        ki = ctl.oh_chem[2] * ((298.0 / t) ** ctl.oh_chem[3]
                               if ctl.oh_chem[3] != 0 else 1.0)
        c = jnp.log10(k0 * M / ki)
        k = k0 * M / (1.0 + k0 * M / ki) * 0.6 ** (1.0 / (1.0 + c * c))
    else:
        return atm

    # High-SO2 correction (c:5392-5398)
    a, b = 4.71572206e-08, -8.28782867e-01
    low = (1.0 / a) ** (1.0 / b)
    cor = 1.0
    if "Cx" in atm.q:
        cx = atm.q["Cx"]
        cor = jnp.where(cx > low, a * jnp.maximum(cx, 1e-30) ** b, 1.0)

    rate = (k * clim_oh(ctl, clim, atm.time, atm.lon, atm.lat, atm.p)
            * M * cor)
    return _apply_loss(atm, cache, rate, "mloss_oh")


def module_h2o2_chem(ctl: Ctl, cache: Cache, clim: Clim, met01: Met,
                     atm: Atm) -> Atm:
    """Aqueous-phase SO2 oxidation by H2O2 inside clouds
    (reference c:4793)."""
    if "m" not in atm.q and "vmr" not in atm.q:
        raise ValueError(
            "Module needs quantity mass or volume mixing ratio!")
    loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
    lwc = interp.interp_time_3d(met01, "lwc", atm.time, loc)
    rwc = interp.interp_time_3d(met01, "rwc", atm.time, loc)
    incloud = (lwc > 0) | (rwc > 0)
    t = interp.interp_time_3d(met01, "t", atm.time, loc)
    M = molec_dens(atm.p, t)
    k = 9.1e7 * jnp.exp(-29700.0 / RI * (1.0 / t - 1.0 / 298.15))
    H_SO2 = 1.3e-2 * jnp.exp(2900.0 * (1.0 / t - 1.0 / 298.15)) * RI * t
    K_1S = 1.23e-2 * jnp.exp(2.01e3 * (1.0 / t - 1.0 / 298.15))
    H_h2o2 = 8.3e2 * jnp.exp(7600.0 * (1.0 / t - 1.0 / 298.15)) * RI * t

    a, b = 3.12541941e-06, -5.72532259e-01
    low = (1.0 / a) ** (1.0 / b)
    cor = 1.0
    if "Cx" in atm.q:
        cx = atm.q["Cx"]
        cor = jnp.where(cx > low, a * jnp.maximum(cx, 1e-30) ** b, 1.0)

    h2o2 = (H_h2o2 * cl.clim_zm(clim.zm["h2o2"], atm.time, atm.lat, atm.p)
            * M * cor * 1000.0 / AVO)
    rho_w = atm.p / (RI * t) * MA / 10.0
    CWC = (lwc + rwc) * rho_w / 1e3
    rate = jnp.where(incloud, k * K_1S * h2o2 * H_SO2 * CWC, 0.0)
    return _apply_loss(atm, cache, rate, "mloss_h2o2")


#: (quantity, O(1D) Arrhenius A, E/R, photolysis-table key)
_TRACER_REACTIONS = (
    ("Cccl4", 3.30e-10, 0.0, "ccl4"),
    ("Cccl3f", 2.30e-10, 0.0, "ccl3f"),
    ("Cccl2f2", 1.40e-10, -25.0, "ccl2f2"),
    ("Cn2o", 1.19e-10, -20.0, "n2o"),
)


def module_tracer_chem(ctl: Ctl, cache: Cache, clim: Clim, met01: Met,
                       atm: Atm) -> Atm:
    """CFC-10/11/12 + N2O photolysis + O(1D) loss (reference c:5889)."""
    active = (cache.dt != 0.0) & atm.mask
    loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
    t = interp.interp_time_3d(met01, "t", atm.time, loc)
    M = molec_dens(atm.p, t)
    o3c = interp.interp_time_2d(met01, "o3c", atm.time, loc)
    sza = jnp.arccos(jnp.clip(cos_sza(atm.time, atm.lon, atm.lat),
                              -1.0, 1.0))
    o1d = (cl.clim_zm(clim.zm["o1d"], atm.time, atm.lat, atm.p)
           if "o1d" in clim.zm else 0.0)

    q = dict(atm.q)
    for name, A, EoverR, photkey in _TRACER_REACTIONS:
        if name not in q:
            continue
        k_o1d = A * jnp.exp(-EoverR / t) * o1d * M
        k_hv = (clim_photo(clim.photo[photkey], clim, atm.p, sza, o3c)
                if photkey in clim.photo else 0.0)
        q[name] = jnp.where(
            active, q[name] * jnp.exp(-cache.dt * (k_hv + k_o1d)),
            q[name])
    return atm.replace(q=q)
