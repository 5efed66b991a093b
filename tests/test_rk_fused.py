"""Fused RK kernel (ops.rk_fused): correctness vs the XLA mirror and
vs the unfused pipeline, fallback safety on unsorted input.

Runs in Pallas interpret mode on CPU (tiny sizes — interpret executes
per-op).  The real-TPU path is exercised by bench.py / perf scripts.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import __graft_entry__ as g
from mptrac_tpu.ops import rk_fused
from mptrac_tpu.ops.sort import module_sort
from mptrac_tpu.physics.timesteps import module_timesteps
from mptrac_tpu.types import astype_state


@pytest.fixture(scope="module")
def setup():
    ctl, clim, met01, atm, cache = g._make_setup(2048, nx=36, ny=19,
                                                 nz=8)
    atm, cache, met01, clim = astype_state(atm, cache, met01, clim)
    pack = rk_fused.build_cell_pack(met01)
    atm, cache = jax.jit(module_sort)(met01, atm, cache)
    cache = jax.jit(lambda c, a, m: module_timesteps(
        ctl, c, m, a, jnp.asarray(180.0)))(cache, atm, met01)
    return ctl, clim, met01, atm, cache, pack


def _run(pack, met01, atm, dtp, nstage=4):
    n = atm.npmax
    wt0 = jnp.full(n, 0.95, jnp.float32)
    return rk_fused.advect_all(
        pack, met01, nstage, atm.lon, atm.lat, atm.p, dtp, wt0,
        interpret=True), wt0


def test_kernel_matches_mirror_sorted(setup):
    """Sorted parcels: kernel + tier fallbacks == the plain XLA
    mirror (identical f32 arithmetic)."""
    ctl, clim, met01, atm, cache, pack = setup
    dtp = cache.dt.astype(jnp.float32)
    (rows, served), wt0 = _run(pack, met01, atm, dtp)
    assert float(served) > 0.95
    ref = rk_fused.rk_xla(
        pack, rk_fused._params(pack, met01)[0], 4, False,
        atm.lon.astype(jnp.float32), atm.lat.astype(jnp.float32),
        atm.p.astype(jnp.float32), dtp, wt0)
    # On real TPU the kernel matches the mirror BITWISE (verified by
    # perf/probe scripts); in CPU interpret mode XLA contracts FMAs
    # differently in the two programs -> fp32-noise tolerance.
    for got, exp in zip(rows, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=3e-3, atol=3e-3)


def test_unsorted_input_is_still_exact(setup):
    """RANDOM (unsorted) parcels: the kernel serves almost nothing,
    the tier-2 full XLA recompute must still deliver exact values —
    no code path may silently zero winds (round-4 failure mode)."""
    ctl, clim, met01, atm0, cache, pack = setup
    rng = np.random.default_rng(3)
    n = atm0.npmax
    atm = atm0.replace(
        lon=jnp.asarray(rng.uniform(-175, 175, n), jnp.float32),
        lat=jnp.asarray(rng.uniform(-55, 55, n), jnp.float32),
        p=jnp.asarray(rng.uniform(250, 850, n), jnp.float32))
    dtp = jnp.full(n, 180.0, jnp.float32)
    (rows, served), wt0 = _run(pack, met01, atm, dtp)
    ref = rk_fused.rk_xla(
        pack, rk_fused._params(pack, met01)[0], 4, False,
        atm.lon, atm.lat, atm.p, dtp, wt0)
    for got, exp in zip(rows, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(exp),
                                   rtol=3e-3, atol=3e-3)
        # and specifically: no zeroed output where the mirror is not 0
        zeroed = (np.asarray(got) == 0) & (np.abs(np.asarray(exp))
                                           > 1e-3)
        assert zeroed.sum() == 0


def test_fused_step_matches_unfused(setup):
    """Full pipeline with the fused kernel vs the packed-gather path:
    positions agree to fp32 tolerance (the fused path evaluates the
    time weight as wt0 - frac*dt/(t1-t0) in f32 and samples sigma/T at
    the post-advect position — documented deviations)."""
    from mptrac_tpu.ops.fast_interp import build_met_pack
    from mptrac_tpu.physics import pipeline
    ctl, clim, met01, atm, cache, _ = setup
    cellpack = build_met_pack(met01, cell=True)
    w64pack = jax.jit(build_met_pack)(met01)
    t = jnp.asarray(180.0, jnp.float64)

    a1, c1 = pipeline.run_timestep(ctl, clim, met01, atm, cache, t,
                                   pack=cellpack)
    a2, c2 = pipeline.run_timestep(ctl, clim, met01, atm, cache, t,
                                   pack=w64pack)
    assert float(c1.served_min) > 0.95
    # meso sigma is sampled ~100 m from the unfused path's sample
    # point; its noise displacement differs by O(1e-3 deg) << cell
    np.testing.assert_allclose(np.asarray(a1.lon), np.asarray(a2.lon),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(a1.lat), np.asarray(a2.lat),
                               rtol=0, atol=5e-3)
    np.testing.assert_allclose(np.asarray(a1.p), np.asarray(a2.p),
                               rtol=1e-3, atol=1e-2)
    # meteo T (sampled at slightly different positions) still close
    np.testing.assert_allclose(np.asarray(a1.q["t"]),
                               np.asarray(a2.q["t"]),
                               rtol=0, atol=0.5)
    # RNG streams advanced identically
    assert int(c1.rng_ctr) == int(c2.rng_ctr)


def test_served_reflects_sorting(setup):
    ctl, clim, met01, atm, cache, pack = setup
    dtp = jnp.full(atm.npmax, 180.0, jnp.float32)
    (_, served_sorted), _ = _run(pack, met01, atm, dtp)
    rng = np.random.default_rng(5)
    perm = rng.permutation(atm.npmax)
    atm_shuf = atm.replace(lon=atm.lon[perm], lat=atm.lat[perm],
                           p=atm.p[perm])
    (_, served_shuf), _ = _run(pack, met01, atm_shuf, dtp)
    assert float(served_sorted) > float(served_shuf)


def test_sort_handles_arbitrary_permutation(setup):
    """module_sort must be exact for ANY initial order (the banded
    permute kernel is guarded by a bandedness check; round-4 advisor
    finding: the first sort of a random ensemble silently zeroed
    state on TPU)."""
    ctl, clim, met01, atm, cache, _ = setup
    from mptrac_tpu.ops.sort import sort_key
    key = np.asarray(sort_key(met01, atm))
    # shuffle to a maximally non-banded order
    rng = np.random.default_rng(11)
    perm0 = rng.permutation(atm.npmax)
    atm_r = atm.replace(
        time=atm.time[perm0], lon=atm.lon[perm0], lat=atm.lat[perm0],
        p=atm.p[perm0], q={k: v[perm0] for k, v in atm.q.items()})
    atm_s, _ = jax.jit(module_sort)(met01, atm_r, cache)
    key_r = np.asarray(sort_key(met01, atm_r))
    order = np.argsort(key_r, kind="stable")
    np.testing.assert_array_equal(np.asarray(atm_s.lon),
                                  np.asarray(atm_r.lon)[order])
    np.testing.assert_array_equal(np.asarray(atm_s.time),
                                  np.asarray(atm_r.time)[order])
