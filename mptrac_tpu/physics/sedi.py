"""Sedimentation (reference module_sedi,
/root/reference/src/mptrac.c:5671-5699): Stokes settling velocity with
Cunningham slip correction applied as a pressure tendency."""

from __future__ import annotations

import jax.numpy as jnp

from mptrac_tpu.config import Ctl
from mptrac_tpu.ops import interp
from mptrac_tpu.ops.thermo import dz2dp, sedi_velocity
from mptrac_tpu.types import Atm, Cache, Met


def module_sedi(ctl: Ctl, cache: Cache, met01: Met, atm: Atm) -> Atm:
    active = (cache.dt != 0.0) & atm.mask
    loc = interp.locate_3d(met01, atm.lon, atm.lat, atm.p)
    t = interp.interp_time_3d(met01, "t", atm.time, loc)
    v_s = sedi_velocity(atm.p, t, atm.q["rp"], atm.q["rhop"])
    p_new = atm.p + dz2dp(v_s * cache.dt / 1000.0, atm.p)
    return atm.replace(p=jnp.where(active, p_new, atm.p))
