"""Wet and dry deposition.

Reference: module_wet_depo (/root/reference/src/mptrac.c:5963-6098),
module_dry_depo (c:4730-4793)."""

from __future__ import annotations

import jax.numpy as jnp

from mptrac_tpu.config import Ctl
from mptrac_tpu.constants import RI
from mptrac_tpu.ops import interp, thermo
from mptrac_tpu.physics.chem import _apply_loss
from mptrac_tpu.types import Atm, Cache, Met


def module_wet_depo(ctl: Ctl, cache: Cache, met01: Met, atm: Atm) -> Atm:
    """In-cloud / below-cloud scavenging (c:5963): precipitation rate
    from total column cloud water (Pisso et al. 2019), exponential
    coefficients for particles (Bakels et al. 2024) or Henry's law for
    gases, with temperature-dependent retention."""
    if "m" not in atm.q and "vmr" not in atm.q:
        raise ValueError(
            "Module needs quantity mass or volume mixing ratio!")
    loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
    pct = interp.interp_time_2d(met01, "pct", atm.time, loc)
    below_top = jnp.isfinite(pct) & (atm.p > pct)
    pcb = interp.interp_time_2d(met01, "pcb", atm.time, loc)
    cl_ = interp.interp_time_2d(met01, "cl", atm.time, loc)

    Is = (jnp.maximum(cl_, 0.0) / ctl.wet_depo_pre[0]) ** (
        1.0 / ctl.wet_depo_pre[1])
    raining = Is >= 0.01

    lwc = interp.interp_time_3d(met01, "lwc", atm.time, loc)
    rwc = interp.interp_time_3d(met01, "rwc", atm.time, loc)
    iwc = interp.interp_time_3d(met01, "iwc", atm.time, loc)
    swc = interp.interp_time_3d(met01, "swc", atm.time, loc)
    inside = (lwc > 0) | (rwc > 0) | (iwc > 0) | (swc > 0)
    t = interp.interp_time_3d(met01, "t", atm.time, loc)

    dz = 1e3 * (thermo.altitude(pct) - thermo.altitude(pcb))
    dz = jnp.where(dz != 0, dz, 1e30)

    # In-cloud coefficient
    eta_ic = jnp.where(
        t > 273.15, 1.0,
        jnp.where(t <= 238.15, ctl.wet_depo_ic_ret_ratio,
                  1.0 + (ctl.wet_depo_ic_ret_ratio - 1.0)
                  * (273.15 - t) / (273.15 - 238.15)))
    if ctl.wet_depo_ic_a > 0:
        lam_ic = ctl.wet_depo_ic_a * Is ** ctl.wet_depo_ic_b * eta_ic
    elif ctl.wet_depo_ic_h[0] > 0:
        h = ctl.wet_depo_ic_h[0] * jnp.exp(
            ctl.wet_depo_ic_h[1] * (1.0 / t - 1.0 / 298.15))
        if ctl.wet_depo_so2_ph > 0:
            H_ion = 10.0 ** (-ctl.wet_depo_so2_ph)
            K_1 = 1.23e-2 * jnp.exp(2.01e3 * (1.0 / t - 1.0 / 298.15))
            K_2 = 6e-8 * jnp.exp(1.12e3 * (1.0 / t - 1.0 / 298.15))
            h = h * (1.0 + K_1 / H_ion + K_1 * K_2 / (H_ion * H_ion))
        lam_ic = h * RI * t * Is / 3.6e6 / dz * eta_ic
    else:
        lam_ic = 0.0

    # Below-cloud coefficient
    eta_bc = jnp.where(t > 270.0, 1.0, ctl.wet_depo_bc_ret_ratio)
    if ctl.wet_depo_bc_a > 0:
        lam_bc = ctl.wet_depo_bc_a * Is ** ctl.wet_depo_bc_b * eta_bc
    elif ctl.wet_depo_bc_h[0] > 0:
        h = ctl.wet_depo_bc_h[0] * jnp.exp(
            ctl.wet_depo_bc_h[1] * (1.0 / t - 1.0 / 298.15))
        lam_bc = h * RI * t * Is / 3.6e6 / dz * eta_bc
    else:
        lam_bc = 0.0

    lam = jnp.where(below_top & raining,
                    jnp.where(inside, lam_ic, lam_bc), 0.0)
    return _apply_loss(atm, cache, lam, "mloss_wet")


def module_dry_depo(ctl: Ctl, cache: Cache, met01: Met, atm: Atm) -> Atm:
    """Deposition-velocity mass loss inside the surface layer
    (c:4730)."""
    if "m" not in atm.q and "vmr" not in atm.q:
        raise ValueError(
            "Module needs quantity mass or volume mixing ratio!")
    loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
    ps = interp.interp_time_2d(met01, "ps", atm.time, loc)
    in_layer = atm.p >= ps - ctl.dry_depo_dp
    dz = 1000.0 * (thermo.altitude(ps - ctl.dry_depo_dp)
                   - thermo.altitude(ps))
    if ctl.qnt("rp") >= 0 and ctl.qnt("rhop") >= 0:
        t = interp.interp_time_3d(met01, "t", atm.time, loc)
        v_dep = thermo.sedi_velocity(atm.p, t, atm.q["rp"],
                                     atm.q["rhop"])
    else:
        v_dep = ctl.dry_depo_vdep
    rate = jnp.where(in_layer, v_dep / dz, 0.0)
    return _apply_loss(atm, cache, rate, "mloss_dry")
