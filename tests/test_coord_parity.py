"""Golden-file parity vs the reference coord_test
(/root/reference/tests/coord_test): a 2-hour UTM-grid run with
advection + turbulent + mesoscale diffusion (deterministic Squares
RNG), compared against the reference outputs in data.ref.

The reference's own t0 output file provides the initial particle
state, bypassing the GSL-seeded atm_init/atm_split tools.  Positions
must match the reference to ~1e-6 relative (they are byte-identical in
practice); sampled met quantities to 1e-4 relative (the reference
formats with %g / 6 significant digits, and FMA fusion shifts the last
double ULP).
"""

import os
import pathlib
import shutil

import numpy as np
import pytest

REF = pathlib.Path("/root/reference/tests/coord_test/data.ref")


def load_tab(path):
    rows = []
    with open(path) as f:
        for line in f:
            toks = line.split()
            if not toks or toks[0].startswith("#"):
                continue
            rows.append([float(x) for x in toks])
    return np.array(rows)


@pytest.fixture(scope="module")
def coord_run(tmp_path_factory):
    if not REF.exists():
        pytest.skip("reference coord_test data not available")
    from mptrac_tpu.sim import run_trac
    from mptrac_tpu.timeutil import time2jsec

    data = tmp_path_factory.mktemp("coord") / "data"
    data.mkdir()
    t1 = time2jsec(2025, 5, 1, 2)
    (data / "trac.ctl").write_text(f"""NQ = 4
QNT_NAME[0] = t
QNT_NAME[1] = u
QNT_NAME[2] = v
QNT_NAME[3] = w
METBASE = /root/reference/tests/data/era5_utm32
TRACER_CHEM = 0
DIFFUSION = 1
DT_MET = 3600.0
T_STOP = {t1}
""")
    # Initial condition from the reference's own t0 output
    init = load_tab(REF / "atm_2025_05_01_00_00_00.tab")[:, :8]
    with open(data / "atm_init.tab", "w") as f:
        for row in init:
            f.write(" ".join(f"{v:.17g}" for v in row) + "\n")

    run_trac(str(data), "trac.ctl", "atm_init.tab",
             ["ATM_BASENAME", "atm", "MET_CAPE", "0", "DT_MOD", "600",
              "ATM_DT_OUT", "600", "MET_COORD_TYPE", "1",
              "MET_UTM_REF_LON", "11.5692782",
              "MET_UTM_REF_LAT", "48.1507476"])
    return data


@pytest.mark.parametrize("fname", [
    "atm_2025_05_01_00_10_00.tab",
    "atm_2025_05_01_01_00_00.tab",
    "atm_2025_05_01_02_00_00.tab",
])
def test_positions_match_reference(coord_run, fname):
    ours = load_tab(coord_run / fname)
    ref = load_tab(REF / fname)
    assert ours.shape == ref.shape
    # time exact; altitude/x/y to float-format precision
    np.testing.assert_array_equal(ours[:, 0], ref[:, 0])
    np.testing.assert_allclose(ours[:, 1], ref[:, 1], rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(ours[:, 2], ref[:, 2], rtol=0, atol=0.02)
    np.testing.assert_allclose(ours[:, 3], ref[:, 3], rtol=0, atol=0.02)


@pytest.mark.parametrize("fname", ["atm_2025_05_01_02_00_00.tab"])
def test_quantities_match_reference(coord_run, fname):
    ours = load_tab(coord_run / fname)
    ref = load_tab(REF / fname)
    # t, u, v, w sampled from met: %g prints 6 significant digits
    for col, rtol, atol in ((4, 1e-4, 0), (5, 1e-4, 1e-4),
                            (6, 1e-4, 1e-4), (7, 1e-4, 1e-6)):
        np.testing.assert_allclose(ours[:, col], ref[:, col],
                                   rtol=rtol, atol=atol)


def test_positions_mostly_byte_identical(coord_run):
    """Stronger check: the vast majority of output lines should be
    byte-identical with the reference (only last-ULP %g formatting of
    diagnostics may differ)."""
    fname = "atm_2025_05_01_02_00_00.tab"
    ours = (coord_run / fname).read_text().splitlines()
    ref = (REF / fname).read_text().splitlines()
    assert len(ours) == len(ref)
    same = sum(a == b for a, b in zip(ours, ref))
    assert same / len(ref) > 0.9
