"""Meteo preprocessing chain.

Host-side numpy rebuild of the derived-field chain applied after every
meteo read (reference /root/reference/src/mptrac.c:7480-7530):
extrapolate -> polar winds -> periodic boundary -> downsampling ->
geopotential -> PV -> PBL -> tropopause -> clouds -> CAPE -> ozone ->
detrend -> monotonize.  Runs once per met file (I/O bound), so plain
vectorized numpy is used; the results are uploaded to device as float32
arrays in a :class:`Met`.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

from mptrac_tpu.config import Ctl
from mptrac_tpu.constants import EPS, G0, H0, MA, MO3, P0, RA, RE, RI
from mptrac_tpu.types import Met

_DEG2RAD = np.pi / 180.0


def _theta(p, t):
    return t * (1000.0 / p) ** 0.286


def _zdiff(lnp0, t0, h2o0, lnp1, t1, h2o1):
    tv0 = t0 * (1.0 + (1.0 - EPS) * np.maximum(h2o0, 0.1e-6))
    tv1 = t1 * (1.0 + (1.0 - EPS) * np.maximum(h2o1, 0.1e-6))
    return RI / MA / G0 * 0.5 * (tv0 + tv1) * (lnp0 - lnp1)


def extrapolate(f3: Dict[str, np.ndarray]) -> None:
    """Fill below-surface levels downward from the lowest valid level
    (reference read_met_extrapolate, c:9146).  Level 0 is the surface
    (descending pressure)."""
    t, u, v, w = f3["t"], f3["u"], f3["v"], f3["w"]
    valid = (np.isfinite(t) & np.isfinite(u) & np.isfinite(v)
             & np.isfinite(w))                       # [nx, ny, np]
    npl = t.shape[-1]
    # ip0 = highest index (from bottom) that is invalid; all ip <= ip0
    # get the value from ip0+1.  Equivalent: for each level ip, find the
    # lowest valid level jp >= ip scanning down, i.e. the first index
    # >= ip from which all following are valid.
    inv_any_below = np.cumsum(~valid[..., ::-1], axis=-1)[..., ::-1]
    # src index: smallest jp such that levels jp.. are all valid
    src = np.argmax(inv_any_below == 0, axis=-1)     # [nx, ny]
    lev = np.arange(npl)
    take = np.maximum(lev[None, None, :], src[..., None])
    for name in ("t", "u", "v", "w", "h2o", "o3", "lwc", "rwc", "iwc",
                 "swc", "cc"):
        f3[name] = np.take_along_axis(f3[name], take, axis=-1)


def polar_winds(lon, lat, f3, coord_type: int) -> None:
    """Average the 89-deg winds into pole rows (reference
    read_met_polar_winds, c:11451)."""
    if coord_type != 0:
        return
    if abs(lat[0]) < 89.999 or abs(lat[-1]) < 89.999:
        return
    nx = lon.size
    u, v = f3["u"], f3["v"]
    for i89, i90 in ((1, 0), (lat.size - 2, lat.size - 1)):
        sign = -1.0 if lat[i90] < 0 else 1.0
        clon = np.cos(sign * _DEG2RAD * lon)[:, None]   # [nx,1]
        slon = np.sin(sign * _DEG2RAD * lon)[:, None]
        u89 = u[:, i89, :]
        v89 = v[:, i89, :]
        velx = np.sum(u89 * clon - v89 * slon, axis=0) / nx  # [np]
        vely = np.sum(u89 * slon + v89 * clon, axis=0) / nx
        u[:, i90, :] = (velx[None, :] * clon + vely[None, :] * slon)
        v[:, i90, :] = (-velx[None, :] * slon + vely[None, :] * clon)


def periodic(lon, f2, f3):
    """Append a wraparound longitude column on global grids (reference
    read_met_periodic, c:11390).  Returns the (possibly extended) lon."""
    if not abs(lon[-1] - lon[0] + lon[1] - lon[0] - 360.0) < 0.01:
        return lon, f2, f3
    lon = np.append(lon, lon[-1] + lon[1] - lon[0])
    for d in (f2, f3):
        for k in list(d):
            d[k] = np.concatenate([d[k], d[k][:1]], axis=0)
    return lon, f2, f3


def geopot(ctl: Ctl, lon, lat, p, f2, f3) -> None:
    """Hydrostatic geopotential heights + horizontal smoothing
    (reference read_met_geopot, c:9186)."""
    t = f3["t"].astype(np.float64)
    h2o = f3["h2o"].astype(np.float64)
    ps = f2["ps"].astype(np.float64)          # [nx, ny]
    zs = f2["zs"].astype(np.float64)
    npl = p.size
    logp = np.log(p)
    lnps = np.log(ps)

    # Surface values by linear-in-p interpolation at ps
    ip0 = _locate_irr_vec(p, ps)                            # [nx, ny]
    p_lo = p[ip0]
    p_hi = p[ip0 + 1]
    w = (ps - p_lo) / (p_hi - p_lo)
    ts = np.take_along_axis(t, ip0[..., None], -1)[..., 0] * (1 - w) + \
        np.take_along_axis(t, ip0[..., None] + 1, -1)[..., 0] * w
    h2os = np.take_along_axis(h2o, ip0[..., None], -1)[..., 0] * (1 - w) + \
        np.take_along_axis(h2o, ip0[..., None] + 1, -1)[..., 0] * w

    z = np.empty_like(t)
    # Cumulative hypsometric integration relative to the surface.
    # Reference anchors both directions at (lnps, ts, h2os).
    # Level-to-level increments:
    dz_up = _zdiff(logp[:-1][None, None, :], t[..., :-1], h2o[..., :-1],
                   logp[1:][None, None, :], t[..., 1:], h2o[..., 1:])
    cum = np.concatenate(
        [np.zeros_like(t[..., :1]), np.cumsum(dz_up, axis=-1)], axis=-1)
    # Anchor: z at level ip0+1 = zs + zdiff(surface -> ip0+1); and
    # z[ip0] = zs + zdiff(surface -> ip0) (a downward step).
    z_anchor_hi = zs + _zdiff(
        lnps, ts, h2os,
        logp[ip0 + 1],
        np.take_along_axis(t, ip0[..., None] + 1, -1)[..., 0],
        np.take_along_axis(h2o, ip0[..., None] + 1, -1)[..., 0])
    cum_at_hi = np.take_along_axis(cum, ip0[..., None] + 1, -1)[..., 0]
    z = z_anchor_hi[..., None] + (cum - cum_at_hi[..., None])
    # Below-anchor part: reference anchors z[ip0] separately from the
    # surface, then steps down with the same increments; the cumulative
    # form is identical because zdiff is additive in lnp, except for the
    # separate surface anchor of the downward branch:
    z_anchor_lo = zs + _zdiff(
        lnps, ts, h2os, logp[ip0],
        np.take_along_axis(t, ip0[..., None], -1)[..., 0],
        np.take_along_axis(h2o, ip0[..., None], -1)[..., 0])
    cum_at_lo = np.take_along_axis(cum, ip0[..., None], -1)[..., 0]
    lev = np.arange(npl)[None, None, :]
    below = lev <= ip0[..., None]
    z_below = z_anchor_lo[..., None] + (cum - cum_at_lo[..., None])
    z = np.where(below, z_below, z)
    f3["z"] = z.astype(np.float32)

    # Horizontal smoothing
    dx, dy = ctl.met_geopot_sx, ctl.met_geopot_sy
    if dx == 0 or dy == 0:
        return
    if dx < 0 or dy < 0:
        if abs(lon[1] - lon[0]) < 0.5:
            dx, dy = 3, 2
        else:
            dx, dy = 6, 4
    f3["z"] = _smooth_xy(f3["z"], dx, dy).astype(np.float32)


def _smooth_xy(z, dx, dy):
    """Triangular-weight horizontal smoothing with periodic lon wrap
    (reference c:9263-9305)."""
    nx, ny = z.shape[:2]
    res = np.zeros_like(z, np.float64)
    wsum = np.zeros_like(z, np.float64)
    for ox in range(-dx + 1, dx):
        wx = 1.0 - abs(ox) / dx
        zx = np.roll(z, -ox, axis=0)
        for oy in range(-dy + 1, dy):
            w = wx * (1.0 - abs(oy) / dy)
            # latitude clamp: shifted-out rows don't contribute
            if oy >= 0:
                sl = zx[:, oy:, :]
                tgt = np.s_[:, : ny - oy, :]
            else:
                sl = zx[:, : ny + oy, :]
                tgt = np.s_[:, -oy:, :]
            ok = np.isfinite(sl)
            res[tgt] += np.where(ok, sl, 0.0) * w
            wsum[tgt] += ok * w
    out = np.where(wsum > 0, res / np.maximum(wsum, 1e-30), np.nan)
    return out


def _locate_irr_vec(xx: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Vectorized reference locate_irr (ascending or descending)."""
    n = xx.size
    if xx[1] > xx[0]:
        i = np.searchsorted(xx, x, side="right") - 1
    else:
        i = np.searchsorted(-xx, -x, side="left") - 1
    return np.clip(i, 0, n - 2).astype(np.int64)


def pv(lon, lat, p, f3, coord_type: int) -> None:
    """Potential vorticity by centered differences (reference
    read_met_pv, c:11513)."""
    t = f3["t"].astype(np.float64)
    u = f3["u"].astype(np.float64)
    v = f3["v"].astype(np.float64)
    nx, ny, npl = t.shape
    pows = (1000.0 / p) ** 0.286

    ix = np.arange(nx)
    ix0 = np.maximum(ix - 1, 0)
    ix1 = np.minimum(ix + 1, nx - 1)
    iy = np.arange(ny)
    iy0 = np.maximum(iy - 1, 0)
    iy1 = np.minimum(iy + 1, ny - 1)
    latr = 0.5 * (lat[iy1] + lat[iy0])                    # [ny]

    if coord_type == 0:
        dxm = 1000.0 * (RE * _DEG2RAD * (lon[ix1] - lon[ix0])[:, None]
                        * np.cos(_DEG2RAD * latr)[None, :])   # [nx, ny]
        dym = 1000.0 * (RE * _DEG2RAD * (lat[iy1] - lat[iy0]))  # [ny]
        c0 = np.cos(_DEG2RAD * lat[iy0])
        c1 = np.cos(_DEG2RAD * lat[iy1])
        cr = np.cos(_DEG2RAD * latr)
        vort = 2 * 7.2921e-5 * np.sin(_DEG2RAD * latr)
    else:
        dxm = np.broadcast_to((lon[ix1] - lon[ix0])[:, None], (nx, ny)).copy()
        dym = lat[iy1] - lat[iy0]
        c0 = c1 = cr = np.ones(ny)
        vort = 2 * 7.2921e-5 * np.sin(latr / (RE * 1000.0))

    tp = t * pows[None, None, :]
    dtdx = (tp[ix1] - tp[ix0]) / dxm[..., None]
    dvdx = (v[ix1] - v[ix0]) / dxm[..., None]
    dtdy = (tp[:, iy1] - tp[:, iy0]) / dym[None, :, None]
    dudy = (u[:, iy1] * c1[None, :, None]
            - u[:, iy0] * c0[None, :, None]) / dym[None, :, None]

    ip = np.arange(npl)
    ip0 = np.maximum(ip - 1, 0)
    ip1 = np.minimum(ip + 1, npl - 1)
    dp0 = 100.0 * (p - p[ip0])
    dp1 = 100.0 * (p[ip1] - p)
    interior = (ip != ip0) & (ip != ip1)

    def ddp(f):
        denom3 = dp0 * dp1 * (dp0 + dp1)
        centered = (dp0 ** 2 * f[..., ip1] - dp1 ** 2 * f[..., ip0]
                    + (dp1 ** 2 - dp0 ** 2) * f) / np.where(
                        interior, denom3, 1.0)
        edge = (f[..., ip1] - f[..., ip0]) / (dp0 + dp1)
        return np.where(interior[None, None, :], centered, edge)

    dtdp = ddp(tp)
    dudp = ddp(u)
    dvdp = ddp(v)

    pv_ = 1e6 * G0 * (
        -dtdp * (dvdx - dudy / cr[None, :, None] + vort[None, :, None])
        + dvdp * dtdx - dudp * dtdy)
    # Polar fix
    if ny >= 3:
        pv_[:, 0, :] = pv_[:, 1, :] = pv_[:, 2, :]
        pv_[:, -1, :] = pv_[:, -2, :] = pv_[:, -3, :]
    f3["pv"] = pv_.astype(np.float32)


def pbl(ctl: Ctl, lon, lat, p, f2, f3) -> None:
    """Planetary boundary layer pressure (reference read_met_pbl,
    c:11253): mode 0 = from file (pressure), 1 = from file (height),
    2 = bulk Richardson number, 3 = theta increase (default)."""
    ps = f2["ps"].astype(np.float64)
    if ctl.met_pbl == 1:
        z = f3["z"].astype(np.float64)
        ztop = f2["zs"].astype(np.float64) + f2["pbl"].astype(np.float64)
        nxny = ps.shape
        ip = np.empty(nxny, np.int64)
        for ixx in range(nxny[0]):      # small grids; fine on host
            for iyy in range(nxny[1]):
                ip[ixx, iyy] = _locate_irr_vec(z[ixx, iyy], np.array(
                    ztop[ixx, iyy]))
        z0 = np.take_along_axis(z, ip[..., None], -1)[..., 0]
        z1 = np.take_along_axis(z, ip[..., None] + 1, -1)[..., 0]
        pblp = p[ip] + (p[ip + 1] - p[ip]) * (ztop - z0) / (z1 - z0)
        f2["pbl"] = pblp.astype(np.float32)
    elif ctl.met_pbl == 2:
        f2["pbl"] = _pbl_richardson(ctl, p, f2, f3).astype(np.float32)
    elif ctl.met_pbl == 3:
        t = f3["t"].astype(np.float64)
        ts = f2["ts"].astype(np.float64)
        theta0 = _theta(ps, ts)
        th = _theta(p[None, None, :], t)        # [nx, ny, npl]
        # Find topmost level (from the top downward) satisfying:
        # p >= 300 and (p > ps or theta <= theta0 + 2)
        dtheta = 2.0
        zmin = 0.1
        cond = (p[None, None, :] >= 300.0) & (
            (p[None, None, :] > ps[..., None])
            | (th <= theta0[..., None] + dtheta))
        npl = p.size
        # reference scans ip from npl-2 down to 1, stops at first cond;
        # if none found ip ends at 0
        idxs = np.arange(npl - 2, 0, -1)
        sub = cond[..., idxs]
        first = np.argmax(sub, axis=-1)
        found = np.any(sub, axis=-1)
        ip = np.where(found, idxs[0] - first, 0)
        th_lo = np.take_along_axis(th, ip[..., None] + 1, -1)[..., 0]
        th_hi = np.take_along_axis(th, ip[..., None], -1)[..., 0]
        p_lo = p[ip + 1]
        p_hi = p[ip]
        pblp = p_lo + (p_hi - p_lo) / np.where(
            th_hi != th_lo, th_hi - th_lo, 1e-30) * (
                theta0 + dtheta - th_lo)
        pbl_min = ps * np.exp(-zmin / H0)
        pblp = np.where((pblp > pbl_min) | (p[ip] > ps), pbl_min, pblp)
        f2["pbl"] = pblp.astype(np.float32)
    # Clamp (applies in all modes)
    pbl_lo = ps * np.exp(-ctl.met_pbl_min / H0)
    pbl_hi = ps * np.exp(-ctl.met_pbl_max / H0)
    f2["pbl"] = np.maximum(np.minimum(f2["pbl"], pbl_lo),
                           pbl_hi).astype(np.float32)


def _pbl_richardson(ctl: Ctl, p, f2, f3):
    """Bulk Richardson number PBL (reference c:11280-11334)."""
    rib_crit, dz, umin = 0.25, 0.05, 5.0
    ps = f2["ps"].astype(np.float64)
    t = f3["t"].astype(np.float64)
    u = f3["u"].astype(np.float64)
    v = f3["v"].astype(np.float64)
    h2o = f3["h2o"].astype(np.float64)
    z = f3["z"].astype(np.float64)
    us = f2["us"].astype(np.float64)
    vs = f2["vs"].astype(np.float64)
    ts = f2["ts"].astype(np.float64)
    zs = f2["zs"].astype(np.float64)
    nx, ny, npl = t.shape
    out = np.empty((nx, ny))
    for ixx in range(nx):
        for iyy in range(ny):
            pbl_bot = ps[ixx, iyy] * np.exp(-dz / H0)
            ip = 1
            while ip < npl and not p[ip] < pbl_bot:
                ip += 1
            h2os = np.interp(pbl_bot, p[::-1], h2o[ixx, iyy][::-1])
            tvs = _theta(pbl_bot, ts[ixx, iyy]) * (
                1.0 + (1.0 - EPS) * max(h2os, 0.1e-6))
            rib_old = 0.0
            val = p[min(ip, npl - 1)]
            for ip2 in range(ip, npl):
                vh2 = max((u[ixx, iyy, ip2] - us[ixx, iyy]) ** 2
                          + (v[ixx, iyy, ip2] - vs[ixx, iyy]) ** 2,
                          umin ** 2)
                thv = _theta(p[ip2], t[ixx, iyy, ip2]) * (
                    1.0 + (1.0 - EPS) * max(h2o[ixx, iyy, ip2], 0.1e-6))
                rib = (G0 * 1e3 * (z[ixx, iyy, ip2] - zs[ixx, iyy]) / tvs
                       * (thv - tvs) / vh2)
                if rib >= rib_crit:
                    val = p[ip2 - 1] + (p[ip2] - p[ip2 - 1]) / (
                        rib - rib_old) * (rib_crit - rib_old)
                    if val > pbl_bot:
                        val = pbl_bot
                    break
                rib_old = rib
            out[ixx, iyy] = val
    return out


def cloud(lon, lat, p, f2, f3) -> None:
    """Cloud top/bottom pressure and total column cloud water
    (reference read_met_cloud, c:8982)."""
    ccmin, cwmin = 0.01, 1e-6
    ps = f2["ps"].astype(np.float64)
    cc = f3["cc"].astype(np.float64)
    lwc = f3["lwc"].astype(np.float64)
    rwc = f3["rwc"].astype(np.float64)
    iwc = f3["iwc"].astype(np.float64)
    swc = f3["swc"].astype(np.float64)
    npl = p.size
    p_hi = P0 * np.exp(-20.0 / H0)
    lev_ok = (p[None, None, :-1] <= ps[..., None]) & (p[:-1] >= p_hi)

    cloudy = lev_ok & (cc[..., :-1] > ccmin) & (
        (lwc[..., :-1] > cwmin) | (rwc[..., :-1] > cwmin)
        | (iwc[..., :-1] > cwmin) | (swc[..., :-1] > cwmin))
    pmid_up = 0.5 * (p[:-1] + p[1:])
    pm1 = np.maximum(np.arange(npl - 1) - 1, 0)
    pmid_dn = 0.5 * (p[:-1] + p[pm1])
    any_cloud = np.any(cloudy, axis=-1)
    # top: last cloudy level (loop keeps overwriting pct)
    last = npl - 2 - np.argmax(cloudy[..., ::-1], axis=-1)
    first = np.argmax(cloudy, axis=-1)
    pct = np.where(any_cloud, pmid_up[last], np.nan)
    pcb = np.where(any_cloud, pmid_dn[first], np.nan)
    tot = lwc + rwc + iwc + swc
    cl = np.sum(np.where(lev_ok, 0.5 * (tot[..., :-1] + tot[..., 1:])
                         * 100.0 * (p[:-1] - p[1:]) / G0, 0.0), axis=-1)
    f2["pct"] = pct.astype(np.float32)
    f2["pcb"] = pcb.astype(np.float32)
    f2["cl"] = cl.astype(np.float32)


def ozone_column(p, f2, f3) -> None:
    """Total column ozone in Dobson units (reference read_met_ozone,
    c:11633)."""
    o3 = f3["o3"].astype(np.float64)
    ps = f2["ps"].astype(np.float64)
    vmr = 0.5 * (o3[..., :-1] + o3[..., 1:])
    dp = (p[:-1] - p[1:])[None, None, :]
    use = p[None, None, :-1] <= ps[..., None]
    cd = np.sum(np.where(use, vmr * MO3 / MA * dp * 1e2 / G0, 0.0), axis=-1)
    f2["o3c"] = (cd / 2.1415e-5).astype(np.float32)


def tropopause(ctl: Ctl, clim, met_time, lon, lat, p, f2, f3) -> None:
    """Tropopause pressure per column (reference read_met_tropo,
    c:11835): 0 none, 1 climatology, 2 cold point, 3 WMO 1st (default),
    4 WMO 2nd, 5 dynamical."""
    from scipy.interpolate import CubicSpline

    nx, ny = f2["ps"].shape
    npl = p.size
    z = H0 * np.log(P0 / p)
    z2 = 4.5 + 0.1 * np.arange(191)
    p2 = P0 * np.exp(-z2 / H0)

    if ctl.met_tropo == 0:
        f2["pt"] = np.full((nx, ny), np.nan, np.float32)
    elif ctl.met_tropo == 1:
        from mptrac_tpu.climatology import clim_tropo_np
        pt = np.empty((nx, ny))
        for iyy in range(ny):
            pt[:, iyy] = clim_tropo_np(clim, met_time, lat[iyy])
        f2["pt"] = pt.astype(np.float32)
    else:
        t3 = f3["t"].astype(np.float64)
        pt = np.full((nx, ny), np.nan)

        def profile(vals, n2):
            """Spline/linear resample of a column profile onto z2[:n2]
            (reference spline, c:12215)."""
            # z is ascending (p descending); the reference spline
            # (c:12215) interpolates on ascending altitude too.
            if ctl.met_tropo_spline:
                cs = CubicSpline(z, vals, bc_type="natural")
                return cs(z2[:n2])
            return np.interp(z2[:n2], z, vals)

        def lapse_rate(p1, t1, pp2, t2):
            return (1e3 * G0 / RA * (t2 - t1) / (t2 + t1)
                    * (pp2 + p1) / (pp2 - p1))

        for ixx in range(nx):
            for iyy in range(ny):
                # Missing-data columns (regional grids) yield NaN, as in
                # the reference where NaN propagates through the spline.
                if not np.all(np.isfinite(t3[ixx, iyy])):
                    continue
                if ctl.met_tropo == 2:
                    t2 = profile(t3[ixx, iyy], 171)
                    iz = int(np.argmin(t2))
                    if 0 < iz < 170:
                        pt[ixx, iyy] = p2[iz]
                elif ctl.met_tropo in (3, 4):
                    t2 = profile(t3[ixx, iyy], 191)
                    iz_found = -1
                    for iz in range(171):
                        ok = True
                        for iz2 in range(iz + 1, iz + 21):
                            if lapse_rate(p2[iz], t2[iz], p2[iz2],
                                          t2[iz2]) > 2.0:
                                ok = False
                                break
                        if ok:
                            iz_found = iz
                            break
                    if ctl.met_tropo == 4:
                        iz = iz_found if iz_found >= 0 else 171
                        # skip region where lapse < 3 fails
                        while iz <= 170:
                            ok = True
                            for iz2 in range(iz + 1, iz + 11):
                                if lapse_rate(p2[iz], t2[iz], p2[iz2],
                                              t2[iz2]) < 3.0:
                                    ok = False
                                    break
                            if ok:
                                break
                            iz += 1
                        iz_found = -1
                        while iz <= 170:
                            ok = True
                            for iz2 in range(iz + 1, iz + 21):
                                if lapse_rate(p2[iz], t2[iz], p2[iz2],
                                              t2[iz2]) > 2.0:
                                    ok = False
                                    break
                            if ok:
                                iz_found = iz
                                break
                            iz += 1
                    if 0 < iz_found < 170:
                        pt[ixx, iyy] = p2[iz_found]
                elif ctl.met_tropo == 5:
                    pv2 = profile(f3["pv"][ixx, iyy].astype(np.float64), 171)
                    th = _theta(p, t3[ixx, iyy])
                    th2 = profile(th, 171)
                    hit = (np.abs(pv2) >= ctl.met_tropo_pv) | (
                        th2 >= ctl.met_tropo_theta)
                    idx = np.argmax(hit)
                    if hit.any() and 0 < idx < 170:
                        pt[ixx, iyy] = p2[idx]
                else:
                    raise ValueError("Cannot calculate tropopause!")
        f2["pt"] = pt.astype(np.float32)

    # Interpolate T, z, h2o at the tropopause (reference c:11983-12006)
    from mptrac_tpu.met.build import interp_columns_at
    f2["tt"] = interp_columns_at(f3["t"], lon, lat, p, f2["pt"],
                                 coord_type=ctl.met_coord_type)
    f2["zt"] = interp_columns_at(f3["z"], lon, lat, p, f2["pt"],
                                 coord_type=ctl.met_coord_type)
    f2["h2ot"] = interp_columns_at(f3["h2o"], lon, lat, p, f2["pt"],
                                   coord_type=ctl.met_coord_type)
