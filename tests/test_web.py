"""Web runner end-to-end: form with met catalog, run submission,
status polling, plot images, results/setup downloads, logs
(reference projects/web_runner/app.py routes)."""

import os
import socket
import subprocess
import sys
import time
import urllib.request
import zipfile

import numpy as np
import pytest


@pytest.fixture(scope="module")
def metdir(tmp_path_factory):
    d = tmp_path_factory.mktemp("met")
    from mptrac_tpu.met.synthetic import make_wind_met
    from mptrac_tpu.met.write_nc import write_met_nc
    for t0, name in ((0.0, "wind_2000_01_01_00.nc"),
                     (21600.0, "wind_2000_01_01_06.nc")):
        write_met_nc(str(d / name), make_wind_met(t0=t0, nx=36,
                                                  ny=19, nz=8),
                     drop_wrap_column=True)
    return d


def _get(url, timeout=30):
    with urllib.request.urlopen(url, timeout=timeout) as r:
        return r.status, r.read().decode(errors="replace")


def test_web_runner_end_to_end(metdir, tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.path.dirname(os.path.dirname(
                   os.path.abspath(__file__))))
    proc = subprocess.Popen(
        [sys.executable, "-m", "mptrac_tpu.web.runner",
         "--port", str(port), "--metbase", str(metdir / "wind"),
         "--dt-met", "21600",
         "--met", f"era5-alias={metdir / 'wind'}:21600",
         "--met", "broken=/nonexistent/met"],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True)
    base = f"http://127.0.0.1:{port}"
    try:
        for _ in range(50):
            try:
                code, body = _get(base + "/")
                break
            except Exception:
                time.sleep(0.2)
        else:
            raise RuntimeError("server did not start")
        # catalog rendered; broken source disabled
        assert "era5-alias" in body
        assert "broken (unavailable)" in body.replace("&gt;", ">")

        data = urllib.parse.urlencode({
            "met": "default", "t0": "0", "hours": "2",
            "lon": "10", "lat": "20", "z": "5", "n": "200",
            "mass": "1e9", "dt_mod": "600", "proj": "robinson",
            "region": "global", "lon_min": "-180", "lon_max": "180",
            "lat_min": "-90", "lat_max": "90", "z_min": "-999",
            "z_max": "-999", "diffusion": "on"}).encode()
        req = urllib.request.Request(base + "/run", data=data)
        with urllib.request.urlopen(req, timeout=30) as r:
            run_url = r.url          # redirected to /status/<id>
        run_id = run_url.rstrip("/").split("/")[-1]

        for _ in range(600):
            code, body = _get(run_url)
            if "running" not in body:
                break
            time.sleep(1.0)
        assert "results.zip" in body, body[:2000]
        assert "setup.zip" in body

        zf = tmp_path / "results.zip"
        with urllib.request.urlopen(
                f"{base}/file/{run_id}/results.zip", timeout=30) as r:
            zf.write_bytes(r.read())
        names = zipfile.ZipFile(zf).namelist()
        assert any(n.endswith(".png") for n in names)
        assert any(n.startswith("atm_") for n in names)

        with urllib.request.urlopen(
                f"{base}/file/{run_id}/setup.zip", timeout=30) as r:
            sz = tmp_path / "setup.zip"
            sz.write_bytes(r.read())
        snames = zipfile.ZipFile(sz).namelist()
        assert "trac.ctl" in snames and "params.json" in snames

        code, logs = _get(base + "/logs")
        assert "started" in logs and "done" in logs
    finally:
        proc.kill()


import urllib.parse  # noqa: E402  (used above)


def test_plot_projections(tmp_path):
    """Projection plot modes render (numpy Robinson/orthographic)."""
    from mptrac_tpu.tools import plot
    from mptrac_tpu.tools._cli import run_tool
    tab = tmp_path / "atm_2000_01_01_00_00_00.tab"
    rng = np.random.default_rng(0)
    rows = np.column_stack([
        np.zeros(100), rng.uniform(5, 12, 100),
        rng.uniform(-180, 180, 100), rng.uniform(-85, 85, 100)])
    np.savetxt(tab, rows)
    for proj in ("cartesian", "robinson", "orthographic"):
        out = tmp_path / f"m_{proj}.png"
        rc = run_tool(plot.main, [
            "plot", "atm", str(out), str(tab), "--proj", proj,
            "--mark", "10", "20", "--zrange", "5", "12"])
        assert rc == 0 and out.exists() and out.stat().st_size > 5000
    out = tmp_path / "m_b.png"
    rc = run_tool(plot.main, [
        "plot", "atm", str(out), str(tab), "--bounds", "-30", "30",
        "-40", "40"])
    assert rc == 0 and out.exists()
