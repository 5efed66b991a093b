#!/bin/bash
# Mint the diabatic-zeta golden-parity fixture (VERDICT r4 item 6; the
# reference analog is tests/interoper_test/run.sh — CLaMS met data,
# MET_CLAMS 1, MET_VERT_COORD 1, ADVECT_VERT_COORD 1, intpol_met_4d_zeta
# mptrac.c:2808).  The interoper test's erai_vlr CLaMS files are
# download-only, so the met is minted here: synthetic CLaMS-convention
# netCDF (dims (time, lon, lat, lev), variables PRESS/ZETA/ZETA_DOT_TOT/
# gph, filename base_YYMMDDHH.nc) with analytic solid-body winds and a
# theta-like monotone zeta coordinate.
#
# golden_zeta/ — 6 h at DT_MOD 180 (120 steps) of pure diabatic
# advection (turbulence/mesoscale diffusion zeroed so the signal is the
# zeta path alone), atm output every 3 h with zeta/zeta_d/theta/p/ps
# quantities.
set -e
cd "$(dirname "$0")"
for t in trac atm_init atm_split time2jsec; do
  [ -x "bin/$t" ] || ./build_ref.sh trac atm_init atm_split time2jsec wind
done
export OMP_NUM_THREADS=4 LANG=C LC_ALL=C

rm -rf golden_zeta && mkdir -p golden_zeta/data
(
cd golden_zeta
t0=$(../bin/time2jsec 2016 7 1 0 0 0 0)
t1=$(../bin/time2jsec 2016 7 1 6 0 0 0)

# --- Mint CLaMS-convention met files (see header; shared verbatim by
# --- the reference run below and the framework parity test)
python3 - "$t0" <<'PYEOF'
import sys

import numpy as np
from scipy.io import netcdf_file

t0 = float(sys.argv[1])
H0, P0, G0 = 7.0, 1013.25, 9.80665
nx, ny, nz = 72, 37, 30
lon = np.arange(nx) * 5.0
lat = -90.0 + np.arange(ny) * 5.0
lev = np.arange(1, nz + 1, dtype=np.float64)
# Model levels: log-spaced sigma from near-surface to ~1 hPa
sigma = np.exp(np.linspace(np.log(0.995), np.log(0.001), nz))


def t_of_p(p):
    return 210.0 + 70.0 * (np.clip(p, 1e-3, None) / P0) ** 0.28


for hh, stamp in ((0, "16070100"), (6, "16070106")):
    tsec = t0 + hh * 3600.0
    amp = 1.0 + 0.1 * (hh / 6.0)
    LA = np.broadcast_to(lat[None, :, None] * np.pi / 180.0,
                         (nx, ny, nz))[None]                 # (1,nx,ny,nz)
    ps2 = 1013.25 * (1.0 - 0.01 * np.sin(2 * LA[..., 0]))    # (1,nx,ny)
    press = ps2[..., None] * sigma[None, None, None, :]      # (1,nx,ny,nz)
    tt = t_of_p(press)
    u = amp * 35.0 * np.cos(LA) * (
        0.5 + 0.5 * (1.0 - sigma)[None, None, None, :])
    v = amp * 3.0 * np.sin(2 * LA) * np.ones_like(press)
    theta = tt * (1000.0 / press) ** 0.286
    # Monotone ascending zeta: theta is monotone in level for this T(p)
    zeta = theta
    # Diabatic heating: gentle cooling aloft, warming below [K/day]
    zdot = amp * (0.5 - 1.0 * (1.0 - sigma))[None, None, None, :] \
        * np.ones_like(press)
    gph_km = H0 * np.log(P0 / press)
    gph = gph_km * 1000.0 * G0                               # m^2/s^2
    w = np.zeros_like(press)

    out = netcdf_file(f"data/clams_{stamp}.nc", "w")
    out.createDimension("time", 1)
    out.createDimension("lon", nx)
    out.createDimension("lat", ny)
    out.createDimension("lev", nz)
    for name, arr, dims in (
            ("time", np.array([tsec]), ("time",)),
            ("lev", lev, ("lev",)),
            ("lat", lat, ("lat",)),
            ("lon", lon, ("lon",))):
        var = out.createVariable(name, np.float64, dims)
        var[:] = arr
    dims4 = ("time", "lon", "lat", "lev")
    for name, arr in (("PRESS", press), ("T", tt), ("U", u), ("V", v),
                      ("W", w), ("ZETA", zeta),
                      ("ZETA_DOT_TOT", zdot / 0.00001157407 * (1 / 86400.0)),
                      ("GPH", gph)):
        var = out.createVariable(name, np.float32, dims4)
        var[:] = arr.astype(np.float32)
    var = out.createVariable("PS", np.float32, ("time", "lon", "lat"))
    var[:] = (ps2 * 100.0).astype(np.float32)                # Pa
    out.close()
    print("minted", f"data/clams_{stamp}.nc")
PYEOF

cat > data/trac.ctl <<EOF
MET_CONVENTION = 1
MET_CLAMS = 1
MET_VERT_COORD = 1
MET_PRESS_LEVEL_DEF = 5
ADVECT = 2
ADVECT_VERT_COORD = 1
NQ = 6
QNT_NAME[0] = theta
QNT_NAME[1] = m
QNT_NAME[2] = zeta
QNT_NAME[3] = zeta_d
QNT_NAME[4] = ps
QNT_NAME[5] = p
METBASE = data/clams
DIRECTION = 1
MET_TROPO = 3
TDEC_TROP = 259200
TDEC_STRAT = 259200
TURB_DX_TROP = 0
TURB_DZ_TROP = 0
TURB_DX_STRAT = 0
TURB_DZ_STRAT = 0
TURB_MESOX = 0
TURB_MESOZ = 0
DT_MOD = 180
DT_MET = 21600
T_START = $t0
T_STOP = $t1
ATM_DT_OUT = 10800
EOF

../bin/atm_init data/trac.ctl data/atm_init.tab \
    INIT_T0 "$t0" INIT_T1 "$t0" \
    INIT_Z0 10.0 INIT_Z1 18.0 INIT_DZ 1.0 \
    INIT_LON0 -30.0 INIT_LON1 30.0 INIT_DLON 10.0 \
    INIT_LAT0 -60.0 INIT_LAT1 60.0 INIT_DLAT 10.0

# Fill the IC zeta column (module_advect_init re-derives pressure from
# it, c:3779; the reference interoper IC is a CLaMS pos file with ZETA
# set).  Same analytic theta(p) as the met minter.
python3 - <<'PYEOF'
import numpy as np

rows = []
with open("data/atm_init.tab") as f:
    for line in f:
        toks = line.split()
        if not toks or toks[0].startswith("#"):
            continue
        rows.append([float(x) for x in toks])
a = np.array(rows)
p = 1013.25 * np.exp(-a[:, 1] / 7.0)
t = 210.0 + 70.0 * (p / 1013.25) ** 0.28
a[:, 6] = t * (1000.0 / p) ** 0.286        # zeta quantity column
with open("data/atm_init.tab", "w") as f:
    for r in a:
        f.write(" ".join("%.14g" % x for x in r) + "\n")
print("IC parcels:", len(a))
PYEOF

echo "data" > data/dirlist
../bin/trac data/dirlist trac.ctl atm_init.tab \
    ATM_BASENAME atm > trac.log 2>&1
tail -3 trac.log
ls data/atm_*.tab
)
echo "minted: golden_zeta"
