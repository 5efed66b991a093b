"""Full-physics golden parity vs the reference model.

Two committed golden sets minted from the reference binaries by
parity/mint_full.sh (see that script for the exact reference commands):

* ``parity/golden_utm`` — 2-hour regional run on the real era5_utm32
  reanalysis fixture: advection + turbulent & mesoscale diffusion +
  exponential decay + interparcel mixing + wet/dry deposition +
  boundary-condition mass sink, RNG_TYPE 1 (Squares), DT_MOD 120
  (60 steps), atm output every 600 s.

* ``parity/golden_chem`` — 2-hour global run on a synthetic
  solid-body-wind met set (minted with the reference `wind` tool,
  wind.c:62-101): SPECIES SO2 with OH chemistry (termolecular JPL
  19-05), H2O2 aqueous chemistry, tracer chemistry + photolysis,
  chem grid, convection (computed CAPE), mixing, decay, wet/dry
  deposition, age-of-air — the trac_test physics configuration
  (reference tests/trac_test/run.sh:22-67) — with
  atm/grid/ens/csi/station/prof/sample/vtk outputs.

Comparators are numeric (allclose), not byte diffs: the reference
prints %g (6 significant digits), so tolerances sit at output-format
precision.  Positions are additionally checked to be *far* tighter
than one grid cell: parity failures from physics-order or RNG-stream
bugs show up km-scale, format noise is metre-scale.
"""

import os
import pathlib
import shutil
import subprocess
import sys

import numpy as np
import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
GOLD_UTM = REPO / "parity" / "golden_utm" / "data"
GOLD_CHEM = REPO / "parity" / "golden_chem" / "data"


def load_tab(path):
    rows = []
    with open(path) as f:
        for line in f:
            toks = line.split()
            if not toks or toks[0].startswith("#"):
                continue
            rows.append([float(x) for x in toks])
    return np.array(rows)


def load_vtk_points(path):
    """Parse the POINTS block of a legacy-ASCII VTK file."""
    vals = []
    with open(path) as f:
        grab = False
        for line in f:
            t = line.split()
            if not t:
                continue
            if t[0] == "POINTS":
                grab = True
                continue
            if grab:
                if not t[0].lstrip("-+.").replace(".", "").isdigit() \
                        and "e" not in t[0] and "E" not in t[0]:
                    break
                try:
                    vals.extend(float(x) for x in t)
                except ValueError:
                    break
    return np.array(vals).reshape(-1, 3)


def run_ours(tmpdir, golden, extra=()):
    data = tmpdir / "data"
    data.mkdir()
    for f in ("trac.ctl", "atm_split.tab", "obs.tab"):
        if (golden / f).exists():
            shutil.copy(golden / f, data / f)
    for f in sorted(golden.glob("met_*.nc")):
        shutil.copy(f, data / f.name)
    from mptrac_tpu.sim import run_trac
    # METBASE / obs paths in the minted ctl are relative to the run
    # directory (same layout as the reference run.sh scripts)
    cwd = os.getcwd()
    os.chdir(tmpdir)
    try:
        run_trac("data", "trac.ctl", "atm_split.tab", list(extra))
    finally:
        os.chdir(cwd)
    return data


def assert_tab_close(ours_path, ref_path, col_tol=None, default=(1e-4, 1e-4)):
    ours = load_tab(ours_path)
    ref = load_tab(ref_path)
    assert ours.shape == ref.shape, \
        f"{os.path.basename(ref_path)}: shape {ours.shape} vs {ref.shape}"
    if ours.size == 0:
        return
    for c in range(ref.shape[1]):
        rtol, atol = (col_tol or {}).get(c, default)
        np.testing.assert_allclose(
            ours[:, c], ref[:, c], rtol=rtol, atol=atol, equal_nan=True,
            err_msg=f"{os.path.basename(ref_path)} column {c}")


@pytest.fixture(scope="module")
def utm_run(tmp_path_factory):
    if not (GOLD_UTM / "trac.ctl").exists():
        pytest.skip("golden_utm fixtures not minted")
    base = tmp_path_factory.mktemp("parity_utm")
    # METBASE in the committed ctl points at the reference checkout
    if not os.path.exists("/root/reference/tests/data/"
                          "era5_utm32_2025_05_01_00.nc"):
        pytest.skip("era5_utm32 reference fixture not available")
    return run_ours(base, GOLD_UTM, ["ATM_BASENAME", "atm"])


@pytest.fixture(scope="module")
def chem_run(tmp_path_factory):
    if not (GOLD_CHEM / "trac.ctl").exists():
        pytest.skip("golden_chem fixtures not minted")
    base = tmp_path_factory.mktemp("parity_chem")
    return run_ours(
        base, GOLD_CHEM,
        ["ATM_BASENAME", "atm",
         "GRID_BASENAME", "grid", "ENS_BASENAME", "ens",
         "STAT_BASENAME", "station",
         "CSI_BASENAME", "csi", "CSI_OBSFILE", "data/obs.tab",
         "PROF_BASENAME", "prof", "PROF_OBSFILE", "data/obs.tab",
         "SAMPLE_BASENAME", "sample", "SAMPLE_OBSFILE", "data/obs.tab",
         "VTK_BASENAME", "atm"])


# ------------------------------------------------------------------ utm

@pytest.mark.parametrize("stamp", ["00_10_00", "01_00_00", "02_00_00"])
def test_utm_atm(utm_run, stamp):
    """Positions/quantities after the full stochastic+depo physics
    chain on real reanalysis data.  x/y to 2 cm (the reference prints
    %g: ~0.1 m at UTM magnitudes), z to 1e-5 km, mass to 1 kg of 5e5."""
    f = f"atm_2025_05_01_{stamp}.tab"
    assert_tab_close(
        utm_run / f, GOLD_UTM / f,
        col_tol={0: (0, 0), 1: (0, 1e-5), 2: (0, 0.05), 3: (0, 0.05),
                 11: (1e-5, 1.0)},
        default=(1e-4, 1e-3))


# ----------------------------------------------------------------- chem

@pytest.mark.parametrize("stamp", ["00_10_00", "01_00_00", "02_00_00"])
def test_chem_atm(chem_run, stamp):
    """Full trac_test-style physics incl. OH/H2O2/tracer chemistry on
    the synthetic lat/lon met: positions to ~1e-5 deg, chem products
    (Cx, Cccl3f) to %g format precision."""
    f = f"atm_2011_06_05_{stamp}.tab"
    assert_tab_close(
        chem_run / f, GOLD_CHEM / f,
        col_tol={0: (0, 0), 1: (0, 1e-5), 2: (0, 1e-5), 3: (0, 1e-5)},
        default=(1e-4, 1e-9))


@pytest.mark.parametrize("stamp", ["01_00_00", "02_00_00"])
def test_chem_grid_output(chem_run, stamp):
    f = f"grid_2011_06_05_{stamp}.tab"
    assert_tab_close(chem_run / f, GOLD_CHEM / f, default=(1e-4, 1e-9))


@pytest.mark.parametrize("stamp", ["01_00_00", "02_00_00"])
def test_chem_ens_output(chem_run, stamp):
    f = f"ens_2011_06_05_{stamp}.tab"
    # sigma columns accumulate mean-of-squares cancellation; 1%
    assert_tab_close(chem_run / f, GOLD_CHEM / f, default=(1e-2, 1e-6))


def test_chem_csi(chem_run):
    assert_tab_close(chem_run / "csi.tab", GOLD_CHEM / "csi.tab",
                     default=(1e-4, 1e-6))


def test_chem_station(chem_run):
    assert_tab_close(chem_run / "station.tab", GOLD_CHEM / "station.tab",
                     default=(1e-4, 1e-6))


def test_chem_prof(chem_run):
    assert_tab_close(chem_run / "prof.tab", GOLD_CHEM / "prof.tab",
                     default=(1e-4, 1e-6))


def test_chem_sample(chem_run):
    assert_tab_close(chem_run / "sample.tab", GOLD_CHEM / "sample.tab",
                     default=(1e-4, 1e-6))


def test_chem_vtk(chem_run):
    ours = load_vtk_points(chem_run / "atm_00003.vtk")
    ref = load_vtk_points(GOLD_CHEM / "atm_00003.vtk")
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
