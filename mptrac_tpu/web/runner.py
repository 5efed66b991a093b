"""Web runner — browser front end for simulation runs.

Rebuild of the reference Flask app
(/root/reference/projects/web_runner/app.py): an HTML form collects
release location/time and physics options, the server seeds parcels
(atm_init/atm_split equivalents), runs the simulation, renders
trajectory plots and serves a zip of all outputs.  Uses only the
Python standard library (http.server) — no Flask dependency.

Run:  python -m mptrac_tpu.web.runner --port 8080 --metbase <path>
"""

from __future__ import annotations

import argparse
import html
import io
import json
import os
import shutil
import subprocess
import sys
import tempfile
import threading
import time
import urllib.parse
import uuid
import zipfile
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

RUNS = {}
CONFIG = {}

FORM = """<!doctype html>
<html><head><title>mptrac-tpu web runner</title>
<style>body{{font-family:sans-serif;max-width:640px;margin:2em auto}}
label{{display:block;margin-top:.6em}}</style></head><body>
<h2>mptrac-tpu simulation runner</h2>
<form method="post" action="/run">
<label>Start time (jsec) <input name="t0" value="{t0}"></label>
<label>Duration [h] <input name="hours" value="12"></label>
<label>Longitude [deg] <input name="lon" value="-72.117"></label>
<label>Latitude [deg] <input name="lat" value="-40.59"></label>
<label>Altitude [km] <input name="z" value="7.5"></label>
<label>Parcels <input name="n" value="2000"></label>
<label>Mass [kg] <input name="mass" value="1e9"></label>
<label><input type="checkbox" name="diffusion" checked> diffusion</label>
<label>Model timestep [s] <input name="dt_mod" value="600"></label>
<button type="submit">Run</button>
</form></body></html>"""


def _run_simulation(run_id, params):
    workdir = RUNS[run_id]["dir"]
    try:
        import numpy as np
        env = dict(os.environ, PYTHONPATH=CONFIG["repo"])

        def tool(*args, timeout=1800):
            r = subprocess.run(
                [sys.executable, "-m", f"mptrac_tpu.tools.{args[0]}",
                 *[str(a) for a in args[1:]]],
                env=env, cwd=workdir, capture_output=True, text=True,
                timeout=timeout)
            if r.returncode != 0:
                raise RuntimeError(f"{args[0]}: {r.stderr[-2000:]}")

        t0 = float(params["t0"])
        t1 = t0 + 3600.0 * float(params["hours"])
        with open(os.path.join(workdir, "trac.ctl"), "w") as f:
            f.write(f"""NQ = 1
QNT_NAME[0] = m
METBASE = {CONFIG['metbase']}
DT_MET = {CONFIG['dt_met']}
MET_TROPO = 0
MET_CAPE = 0
T_STOP = {t1}
DIFFUSION = {1 if params.get('diffusion') else 0}
""")
        tool("atm_init", "trac.ctl", "init.tab",
             "INIT_T0", t0, "INIT_T1", t0,
             "INIT_Z0", params["z"], "INIT_Z1", params["z"],
             "INIT_LON0", params["lon"], "INIT_LON1", params["lon"],
             "INIT_LAT0", params["lat"], "INIT_LAT1", params["lat"])
        tool("atm_split", "trac.ctl", "init.tab", "split.tab",
             "SPLIT_N", params["n"], "SPLIT_M", params["mass"],
             "SPLIT_DX", "30", "SPLIT_DZ", "1")
        with open(os.path.join(workdir, "dirlist"), "w") as f:
            f.write(".\n")
        tool("trac", "dirlist", "trac.ctl", "split.tab",
             "ATM_BASENAME", "atm", "DT_MOD", params["dt_mod"],
             "ATM_DT_OUT", 3600)
        tabs = sorted(f for f in os.listdir(workdir)
                      if f.startswith("atm_") and f.endswith(".tab"))
        tool("plot", "atm", "map_{}.png", *tabs)
        zpath = os.path.join(workdir, "results.zip")
        with zipfile.ZipFile(zpath, "w") as z:
            for f in os.listdir(workdir):
                if f.endswith((".tab", ".png", ".ctl")):
                    z.write(os.path.join(workdir, f), f)
        RUNS[run_id].update(status="done",
                            files=[f for f in os.listdir(workdir)
                                   if f.endswith(".png")])
    except Exception as exc:
        RUNS[run_id].update(status="error", error=str(exc))


class Handler(BaseHTTPRequestHandler):
    def log_message(self, fmt, *args):
        pass

    def _send(self, body, ctype="text/html", code=200):
        data = body if isinstance(body, bytes) else body.encode()
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        parts = self.path.split("?")[0].strip("/").split("/")
        if self.path == "/" or not parts[0]:
            self._send(FORM.format(t0=CONFIG.get("default_t0", 0.0)))
        elif parts[0] == "status" and len(parts) > 1:
            run = RUNS.get(parts[1])
            if run is None:
                self._send("unknown run", code=404)
                return
            if run["status"] == "running":
                self._send("<html><head><meta http-equiv=refresh "
                           "content=2></head><body>running...</body>"
                           "</html>")
            elif run["status"] == "error":
                self._send("<pre>" + html.escape(run["error"])
                           + "</pre>", code=500)
            else:
                links = "".join(
                    f'<div><img src="/file/{parts[1]}/{f}" '
                    'style="max-width:100%"></div>'
                    for f in sorted(run["files"]))
                self._send(
                    f'<a href="/file/{parts[1]}/results.zip">'
                    f"download results.zip</a>{links}")
        elif parts[0] == "file" and len(parts) > 2:
            run = RUNS.get(parts[1])
            fn = os.path.join(run["dir"], parts[2]) if run else None
            if fn and os.path.exists(fn):
                ctype = ("image/png" if fn.endswith(".png")
                         else "application/zip")
                with open(fn, "rb") as f:
                    self._send(f.read(), ctype)
            else:
                self._send("not found", code=404)
        else:
            self._send("not found", code=404)

    def do_POST(self):
        if self.path != "/run":
            self._send("not found", code=404)
            return
        length = int(self.headers.get("Content-Length", 0))
        params = dict(urllib.parse.parse_qsl(
            self.rfile.read(length).decode()))
        run_id = uuid.uuid4().hex[:12]
        workdir = tempfile.mkdtemp(prefix=f"webrun_{run_id}_")
        RUNS[run_id] = dict(status="running", dir=workdir)
        threading.Thread(target=_run_simulation,
                         args=(run_id, params), daemon=True).start()
        self.send_response(303)
        self.send_header("Location", f"/status/{run_id}")
        self.end_headers()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--metbase", required=True)
    ap.add_argument("--dt-met", type=float, default=86400.0)
    ap.add_argument("--default-t0", type=float, default=0.0)
    args = ap.parse_args(argv)
    CONFIG.update(metbase=args.metbase, dt_met=args.dt_met,
                  default_t0=args.default_t0,
                  repo=os.path.dirname(os.path.dirname(
                      os.path.dirname(os.path.abspath(__file__)))))
    srv = ThreadingHTTPServer(("127.0.0.1", args.port), Handler)
    print(f"web runner listening on http://127.0.0.1:{args.port}")
    srv.serve_forever()


if __name__ == "__main__":
    main()
