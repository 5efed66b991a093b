"""C binding (bindings/mptrac_c.*): build the shim + demo driver and
run a simulation end-to-end through the C surface (the analog of the
reference Fortran-wrapper test, src/trac_fortran.f90)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def demo_bin():
    r = subprocess.run(["make", "-C", os.path.join(REPO, "bindings")],
                       capture_output=True, text=True, timeout=120)
    if r.returncode != 0:
        pytest.skip(f"bindings build failed: {r.stderr[-300:]}")
    return os.path.join(REPO, "bindings", "demo_trac")


def test_c_api_runs_simulation(demo_bin, tmp_path):
    ctl = tmp_path / "trac.ctl"
    ctl.write_text(
        "NQ = 0\nMETBASE = wind\nDT_MET = 21600\nMET_DT_OUT = 0\n"
        "DIFFUSION = 0\nADVECT = 2\nDT_MOD = 600\nT_START = 0\n"
        "T_STOP = 21600\nDIRECTION = 1\nATM_BASENAME = atm\n"
        "ATM_DT_OUT = 21600\n")
    env = dict(os.environ, PYTHONPATH=REPO, MPTRAC_TPU_ROOT=REPO,
               JAX_PLATFORMS="cpu")
    for t0 in (0, 21600):
        subprocess.run(
            [sys.executable, "-m", "mptrac_tpu.tools.wind", "trac.ctl",
             "wind", "WIND_T0", str(t0), "WIND_NX", "72", "WIND_NY",
             "37", "WIND_NZ", "8"],
            cwd=tmp_path, env=env, check=True, capture_output=True,
            timeout=300)
    subprocess.run(
        [sys.executable, "-m", "mptrac_tpu.tools.atm_init", "trac.ctl",
         "atm_init.tab", "INIT_LON0", "20", "INIT_LON1", "20",
         "INIT_LAT0", "0", "INIT_LAT1", "0", "INIT_Z0", "10",
         "INIT_Z1", "10"],
        cwd=tmp_path, env=env, check=True, capture_output=True,
        timeout=300)

    r = subprocess.run([demo_bin, ".", "trac.ctl", "atm_init.tab"],
                       cwd=tmp_path, env=env, capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-500:]
    assert "done: 37 steps, 1 parcels" in r.stdout
    # solid-body default: 7.5 deg eastward drift over 6 h
    out = np.loadtxt(tmp_path / "atm_2000_01_01_06_00_00.tab",
                     ndmin=2)
    assert abs(out[0, 2] - 27.5) < 0.05
    assert abs(out[0, 3]) < 0.05
