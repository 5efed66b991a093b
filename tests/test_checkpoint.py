"""Checkpoint/resume: a run interrupted at half time and resumed from
the checkpoint must reproduce the uninterrupted run bit-for-bit
(including RNG counter and mesoscale perturbation state — the stateful
parts the reference loses on restart)."""

import numpy as np
import pytest


def make_sim(tmp_path, t_stop, **kw):
    import jax.numpy as jnp
    from mptrac_tpu import read_ctl
    from mptrac_tpu.sim import Simulation
    from mptrac_tpu.types import Atm
    from mptrac_tpu.met.synthetic import make_wind_met
    from mptrac_tpu.met.write_nc import write_met_nc

    for t0 in (0.0, 86400.0):
        fn = tmp_path / f"wind_2000_01_0{1 + int(t0 // 86400)}_00.nc"
        if not fn.exists():
            write_met_nc(str(fn),
                         make_wind_met(t0=t0, nx=36, ny=19, nz=8),
                         drop_wrap_column=True)

    ctl = read_ctl(None, [
        "NQ", "1", "QNT_NAME[0]", "m",
        "METBASE", str(tmp_path / "wind"), "DT_MET", "86400",
        "MET_TROPO", "0", "MET_CAPE", "0", "MET_PBL", "3",
        "DIFFUSION", "1", "DT_MOD", "600", "T_STOP", str(t_stop)])
    n = 100
    rng = np.random.default_rng(3)
    atm = Atm.zeros(n, ctl.qnt_name)
    atm = atm.replace(
        time=jnp.zeros(n),
        lon=jnp.asarray(rng.uniform(-170, 170, n)),
        lat=jnp.asarray(rng.uniform(-80, 80, n)),
        p=jnp.asarray(rng.uniform(300, 900, n)),
        np=jnp.asarray(n, jnp.int32))
    atm.q["m"] = jnp.ones(n)
    return Simulation(ctl, atm, dirname=str(tmp_path), **kw)


def test_checkpoint_resume_bitexact(tmp_path):
    ck = tmp_path / "state.ckpt.npz"

    # Uninterrupted 2-hour run
    sim_full = make_sim(tmp_path, 7200.0)
    sim_full.run(write_output=False)

    # Run writing a checkpoint every 30 min, then a fresh Simulation
    # resumed from the 1-hour checkpoint
    sim_a = make_sim(tmp_path, 3600.0, checkpoint_file=str(ck),
                     checkpoint_dt=1800.0)
    sim_a.run(write_output=False)

    sim_b = make_sim(tmp_path, 7200.0)
    sim_b.resume(str(ck))
    sim_b.run(write_output=False)

    np.testing.assert_array_equal(np.asarray(sim_b.atm.lon),
                                  np.asarray(sim_full.atm.lon))
    np.testing.assert_array_equal(np.asarray(sim_b.atm.lat),
                                  np.asarray(sim_full.atm.lat))
    np.testing.assert_array_equal(np.asarray(sim_b.atm.p),
                                  np.asarray(sim_full.atm.p))
    assert int(sim_b.cache.rng_ctr) == int(sim_full.cache.rng_ctr)
    np.testing.assert_array_equal(np.asarray(sim_b.cache.uvwp),
                                  np.asarray(sim_full.cache.uvwp))


def test_timers_report(tmp_path, capsys):
    sim = make_sim(tmp_path, 1200.0)
    sim.run(write_output=False)
    sim.timers.report()
    out = capsys.readouterr().out
    assert "TIMER_GET_MET" in out and "TIMER_RUN_TIMESTEP" in out
    assert "TIMER_GROUP_PHYSICS" in out and "TIMER_TOTAL" in out
