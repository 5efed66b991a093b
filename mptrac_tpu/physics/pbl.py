"""PBL turbulence closure (Hanna / FLEXPART scheme).

Reference: module_diff_pbl (/root/reference/src/mptrac.c:4335-4580):
regime-dependent (neutral / unstable / stable) velocity standard
deviations and Lagrangian timescales from Monin-Obukhov theory, AR(1)
velocity perturbations with well-mixed drift, and reflection at the
surface and the PBL top.  The reference's branch-heavy per-parcel code
becomes masked ``jnp.where`` ladders.
"""

from __future__ import annotations

import jax.numpy as jnp

from mptrac_tpu.config import Ctl
from mptrac_tpu.constants import CPD, G0, H0, KARMAN, P0
from mptrac_tpu.ops import interp, thermo
from mptrac_tpu.ops.rng import module_rng3
from mptrac_tpu.ops.thermo import dx2coord, dy2coord
from mptrac_tpu.types import Atm, Cache, Met


def module_diff_pbl(ctl: Ctl, cache: Cache, met01: Met, atm: Atm):
    n = atm.npmax
    rs, ctr = module_rng3(ctl.rng_type, cache.rng_ctr, n,
                          dtype=atm.lon.dtype)
    cache = cache.replace(rng_ctr=ctr)

    dt = cache.dt
    loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
    pbl = interp.interp_time_2d(met01, "pbl", atm.time, loc)
    ps = interp.interp_time_2d(met01, "ps", atm.time, loc)

    active = ((dt != 0.0) & atm.mask & (atm.p >= pbl)
              & (ps > 0.0) & (pbl > 0.0) & (ps > pbl))

    p = jnp.minimum(atm.p, ps)
    zs = thermo.altitude(ps)
    z_raw = 1e3 * (thermo.altitude(p) - zs)
    zi = 1e3 * (thermo.altitude(pbl) - zs)
    active = active & (zi > 1.0)
    zi_safe = jnp.maximum(zi, 1.001)
    z = jnp.clip(z_raw, 0.0, zi_safe)
    zeta = jnp.clip(z / zi_safe, 1e-6, 1.0 - 1e-6)
    z_m = jnp.maximum(z, 1.0)

    # Thermodynamics at the clamped pressure
    loc_p = interp.locate_3d(met01, atm.lon, atm.lat, p)
    ess = interp.interp_time_2d(met01, "ess", atm.time, loc_p)
    nss = interp.interp_time_2d(met01, "nss", atm.time, loc_p)
    t = interp.interp_time_3d(met01, "t", atm.time, loc_p)
    h2o = interp.interp_time_3d(met01, "h2o", atm.time, loc_p)
    shf = interp.interp_time_2d(met01, "shf", atm.time, loc_p)

    tv = thermo.tvirt(t, h2o)
    thetav = thermo.theta_virt(p, t, h2o)
    rho = thermo.rho(p, tv)
    active = active & (rho > 0.0)
    tau_stress = jnp.sqrt(ess * ess + nss * nss)
    ustar = jnp.sqrt(jnp.maximum(tau_stress / jnp.maximum(rho, 1e-30), 0.0))
    ust = jnp.maximum(1e-4, ustar)

    ol = jnp.where(
        jnp.abs(shf) > 1e-6,
        thetav * rho * CPD * ust * ust * ust
        / (KARMAN * G0 * jnp.where(jnp.abs(shf) > 1e-6, shf, 1.0)),
        1e12)

    neutral = zi_safe / jnp.abs(ol) < 1.0
    unstable = (~neutral) & (ol < 0.0)
    stable = (~neutral) & (ol >= 0.0)

    # --- Neutral (c:4428-4443)
    corr = z_m / ust
    sigw0 = 1.3 * ust * jnp.exp(-2e-4 * corr)
    n_sig_u = jnp.maximum(2.0 * ust * jnp.exp(-3e-4 * corr), 1e-5)
    n_sig_v = jnp.maximum(sigw0, 1e-5)
    n_sig_w = jnp.maximum(sigw0, 1e-5)
    n_dsigw_dz = -2e-4 * sigw0 / ust
    n_tau_u = 0.5 * z_m / n_sig_w / (1.0 + 1.5e-3 * corr)

    # --- Unstable (c:4446-4497)
    wstar_arg = -G0 / thetav * shf / (rho * CPD) * zi_safe
    wstar = jnp.maximum(wstar_arg, 0.0) ** (1.0 / 3.0)
    u_sig_u = jnp.maximum(
        ust * jnp.maximum(12.0 - 0.5 * zi_safe / ol, 0.0) ** (1.0 / 3.0),
        1e-6)
    arg = jnp.maximum(3.0 * zeta - ol / zi_safe, 1e-12)
    s1 = 0.96 * arg ** (1.0 / 3.0)
    s2 = 0.763 * zeta ** 0.175
    # zeta < 0.03
    w_a = 0.96 * wstar * arg ** (1.0 / 3.0)
    d_a = 1.8432 * wstar * wstar / zi_safe * arg ** (-1.0 / 3.0)
    # 0.03 <= zeta < 0.4, branch on s1 < s2
    w_b1 = wstar * s1
    d_b1 = d_a
    w_b2 = wstar * s2
    d_b2 = 0.203759 * wstar * wstar / zi_safe * zeta ** (-0.65)
    # 0.4 <= zeta < 0.96
    w_c = 0.722 * wstar * (1.0 - zeta) ** 0.207
    d_c = -0.215812 * wstar * wstar / zi_safe * (1.0 - zeta) ** (-0.586)
    # zeta >= 0.96
    w_d = 0.37 * wstar
    d_d = jnp.zeros_like(wstar)
    u_sig_w = jnp.where(
        zeta < 0.03, w_a,
        jnp.where(zeta < 0.4, jnp.where(s1 < s2, w_b1, w_b2),
                  jnp.where(zeta < 0.96, w_c, w_d)))
    u_dsigw2_dz = jnp.where(
        zeta < 0.03, d_a,
        jnp.where(zeta < 0.4, jnp.where(s1 < s2, d_b1, d_b2),
                  jnp.where(zeta < 0.96, d_c, d_d)))
    u_sig_w = jnp.maximum(u_sig_w, 1e-6)
    u_dsigw_dz = jnp.where(u_sig_w > 1e-12,
                           0.5 * u_dsigw2_dz / u_sig_w, 0.0)
    u_tau_u = 0.15 * zi_safe / jnp.maximum(u_sig_u, 1e-12)
    denom = jnp.maximum(0.55 - 0.38 * jnp.abs(z_m / ol), 0.05)
    u_tau_w = jnp.where(
        z_m < jnp.abs(ol), 0.1 * z_m / (u_sig_w * denom),
        jnp.where(zeta < 0.1, 0.59 * z_m / u_sig_w,
                  0.15 * zi_safe / u_sig_w
                  * (1.0 - jnp.exp(-5.0 * zeta))))

    # --- Stable (c:4500-4510)
    s_sig_u = jnp.maximum(2.0 * ust * (1.0 - zeta), 1e-6)
    s_sig_v = jnp.maximum(1.3 * ust * (1.0 - zeta), 1e-6)
    s_sig_w = s_sig_v
    s_dsigw_dz = -1.3 * ust / zi_safe
    s_tau_u = 0.15 * zi_safe / s_sig_u * jnp.sqrt(zeta)
    s_tau_v = 0.467 * s_tau_u
    s_tau_w = 0.1 * zi_safe / s_sig_w * zeta ** 0.8

    sig_u = jnp.where(neutral, n_sig_u,
                      jnp.where(unstable, u_sig_u, s_sig_u))
    sig_v = jnp.where(neutral, n_sig_v,
                      jnp.where(unstable, u_sig_u, s_sig_v))
    sig_w = jnp.where(neutral, n_sig_w,
                      jnp.where(unstable, u_sig_w, s_sig_w))
    dsigw_dz = jnp.where(neutral, n_dsigw_dz,
                         jnp.where(unstable, u_dsigw_dz, s_dsigw_dz))
    tau_u = jnp.where(neutral, n_tau_u,
                      jnp.where(unstable, u_tau_u, s_tau_u))
    tau_v = jnp.where(neutral, n_tau_u,
                      jnp.where(unstable, u_tau_u, s_tau_v))
    tau_w = jnp.where(neutral, n_tau_u,
                      jnp.where(unstable, u_tau_w, s_tau_w))

    tau_u = jnp.maximum(tau_u, 10.0)
    tau_v = jnp.maximum(tau_v, 10.0)
    tau_w = jnp.maximum(tau_w, 30.0)
    active = active & (sig_u > 0) & (sig_v > 0) & (sig_w > 0)

    dt_abs = jnp.abs(dt)
    ru = jnp.exp(-dt_abs / tau_u)
    ru2 = jnp.sqrt(jnp.maximum(0.0, 1.0 - ru * ru))
    rv = jnp.exp(-dt_abs / tau_v)
    rv2 = jnp.sqrt(jnp.maximum(0.0, 1.0 - rv * rv))
    rw = jnp.exp(-dt_abs / tau_w)
    rw2 = jnp.sqrt(jnp.maximum(0.0, 1.0 - rw * rw))

    up = cache.uvwp[0].astype(atm.lon.dtype)
    vp = cache.uvwp[1].astype(atm.lon.dtype)
    wp = cache.uvwp[2].astype(atm.lon.dtype)

    up_new = (up * ru + sig_u * ru2 * rs[0]).astype(jnp.float32)
    vp_new = (vp * rv + sig_v * rv2 * rs[1]).astype(jnp.float32)
    rhoaux = -1.0 / (1e3 * H0)
    wp_new = (wp * rw + sig_w * rw2 * rs[2]
              + tau_w * (1.0 - rw)
              * (2.0 * sig_w * dsigw_dz + rhoaux * sig_w * sig_w)
              ).astype(jnp.float32)

    cart = met01.coord_type != 0
    lon = atm.lon + dx2coord(up_new.astype(atm.lon.dtype) * dt, atm.lat, cart)
    lat = atm.lat + dy2coord(vp_new.astype(atm.lon.dtype) * dt, cart)

    # Reflect at surface and PBL top, flipping the perturbation
    znew = z + wp_new.astype(atm.lon.dtype) * dt
    wflip = wp_new
    for _ in range(6):
        below = znew < 0.0
        znew = jnp.where(below, -znew, znew)
        wflip = jnp.where(below, -wflip, wflip)
        above = znew > zi_safe
        znew = jnp.where(above, 2.0 * zi_safe - znew, znew)
        wflip = jnp.where(above, -wflip, wflip)
    znew = jnp.clip(znew, 0.0, zi_safe)
    p_new = jnp.clip(P0 * jnp.exp(-(zs + znew / 1000.0) / H0), pbl, ps)

    uvwp = jnp.stack([
        jnp.where(active, up_new, cache.uvwp[0]),
        jnp.where(active, vp_new, cache.uvwp[1]),
        jnp.where(active, wflip, cache.uvwp[2])])
    cache = cache.replace(uvwp=uvwp)
    return atm.replace(
        lon=jnp.where(active, lon, atm.lon),
        lat=jnp.where(active, lat, atm.lat),
        p=jnp.where(active, p_new, atm.p)), cache
