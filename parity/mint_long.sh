#!/bin/bash
# Mint the 1000-step golden-parity fixture (VERDICT r4 item 5; the
# reference analog is the trac_test byte-identical 3-day contract,
# /root/reference/tests/trac_test/run.sh:113-119).
#
# golden_long/ — the golden_chem physics configuration (trac_test set:
# SO2 + OH/H2O2/tracer chemistry, convection, mixing, decay, wet/dry
# deposition) run for 34 h at DT_MOD 120 s = 1020 steps on synthetic
# solid-body-wind met minted with the reference `wind` tool
# (wind.c:62-101).  Staged outputs are kept at +2 h (step 60), +10 h
# (step 300) and +34 h (step 1020) so the parity test can document
# divergence growth under the bit-exact Squares RNG.
set -e
cd "$(dirname "$0")"
for t in trac atm_init atm_split time2jsec wind; do
  [ -x "bin/$t" ] || ./build_ref.sh trac atm_init atm_split time2jsec wind
done
export OMP_NUM_THREADS=4 LANG=C LC_ALL=C

rm -rf golden_long && mkdir -p golden_long/data
(
cd golden_long
t0=$(../bin/time2jsec 2011 6 5 0 0 0 0)
t1=$(../bin/time2jsec 2011 6 6 10 0 0 0)   # +34 h = 1020 steps

cat > data/met.ctl <<EOF
MET_TROPO = 3
EOF
for h in $(seq 0 2 34); do
  d=5; hh=$h
  if [ "$h" -ge 24 ]; then d=6; hh=$((h - 24)); fi
  ../bin/wind data/met.ctl data/met \
      WIND_T0 "$(../bin/time2jsec 2011 6 $d $hh 0 0 0)" \
      WIND_NX 36 WIND_NY 19 WIND_NZ 20 WIND_Z1 60 \
      WIND_ALPHA 30.0 WIND_W0 0.001 \
      WIND_TEMP0 280 WIND_TEMP1 210 \
      WIND_IEWS 0.05 WIND_INSS 0.02 WIND_ISHF 10 \
      WIND_Q 0.003 WIND_O3 1e-7 WIND_BLH 1.0 >> wind.log 2>&1
done
# Classic netCDF-3 conversion (identical dtypes/values) so the
# reference (libnetcdf) and the framework (scipy netcdf3 reader)
# consume bit-identical fixtures — same step as mint_full.sh.
python3 - <<'PYEOF'
import glob
import h5py
import numpy as np
from scipy.io import netcdf_file

for path in sorted(glob.glob("data/met_2011*.nc")):
    src = h5py.File(path, "r")
    arrs = {k: src[k][...] for k in src.keys()}
    attrs = {k: {a: src[k].attrs[a] for a in ("units", "long_name")
                 if a in src[k].attrs} for k in src.keys()}
    src.close()
    out = netcdf_file(path, "w")
    for dim, name in (("time", "time"), ("lev", "lev"),
                      ("lat", "lat"), ("lon", "lon")):
        out.createDimension(dim, arrs[name].shape[0])
    dims4 = ("time", "lev", "lat", "lon")
    for k, a in arrs.items():
        if a.ndim == 1:
            dims = (k,)
        elif a.ndim == 3:
            dims = ("time", "lat", "lon")
        else:
            dims = dims4
        v = out.createVariable(k, a.dtype, dims)
        v[:] = a
        for an, av in attrs[k].items():
            setattr(v, an,
                    av.decode() if isinstance(av, bytes) else str(av))
    out.close()
PYEOF
echo "met files: $(ls data/met_2011*.nc | wc -l)"

cat > data/trac.ctl <<EOF
NQ = 12
QNT_NAME[0] = t
QNT_NAME[1] = u
QNT_NAME[2] = v
QNT_NAME[3] = w
QNT_NAME[4] = zg
QNT_NAME[5] = ps
QNT_NAME[6] = m
QNT_NAME[7] = stat
QNT_NAME[8] = ens
QNT_NAME[9] = Cccl3f
QNT_NAME[10] = Cx
QNT_NAME[11] = aoa
METBASE = data/met
MET_DT_OUT = 600
MET_TROPO = 3
SPECIES = SO2
H2O2_CHEM_REACTION = 1
TRACER_CHEM = 1
CLIM_PHOTO = /root/reference/data/clams_photolysis_rates.nc
CLIM_OH_FILENAME = /root/reference/data/clams_radical_species_vmr.nc
CLIM_H2O2_FILENAME = /root/reference/data/cams_H2O2.nc
CLIM_HO2_FILENAME = /root/reference/data/clams_radical_species_vmr.nc
CLIM_O1D_FILENAME = /root/reference/data/clams_radical_species_vmr.nc
CLIM_CCL3F_TIMESERIES = /root/reference/data/noaa_gml_cfc11.tab
CONV_CAPE = 0.0
DIFFUSION = 1
TDEC_TROP = 259200.0
TDEC_STRAT = 259200.0
DRY_DEPO_VDEP = 0.15
DRY_DEPO_DP = 300
MIXING_TROP = 1e-3
MIXING_STRAT = 1e-6
BOUND_LAT0 = -90
BOUND_LAT1 = 90
BOUND_P0 = 1e10
BOUND_P1 = -1e10
BOUND_DPS = 100.0
BOUND_MASS = 0.0
DT_MET = 7200.0
DT_MOD = 120.0
ATM_DT_OUT = 7200.0
T_STOP = $t1
EOF

../bin/atm_init data/trac.ctl data/atm_init.tab \
    INIT_T0 "$t0" INIT_T1 "$t0" INIT_Z0 10.0 INIT_Z1 10.0 \
    INIT_LON0 -72.117 INIT_LON1 -72.117 \
    INIT_LAT0 -40.59 INIT_LAT1 -40.59
../bin/atm_split data/trac.ctl data/atm_init.tab data/atm_split.tab \
    SPLIT_N 2000 SPLIT_M 1e9 SPLIT_DX 30.0 SPLIT_DZ 5.0

echo "data" > data/dirlist
../bin/trac data/dirlist trac.ctl atm_split.tab \
    ATM_BASENAME atm > trac.log 2>&1
tail -3 trac.log
# Keep only the staged stamps (init, +2 h / step 60, +10 h / step 300,
# +34 h / step 1020) — intermediate files are just mint noise.
for f in data/atm_2011_*.tab; do
  case "$f" in
    *2011_06_05_00_00_00*|*2011_06_05_02_00_00*|\
    *2011_06_05_10_00_00*|*2011_06_06_10_00_00*) ;;
    *) rm -f "$f" ;;
  esac
done
rm -f data/atm_init.tab
ls data/atm_*.tab
)
echo "minted: golden_long"
