#!/bin/bash
# Mint full-physics golden-parity fixtures from the reference model
# (built on demand by build_ref.sh; parity/bin is gitignored).
#
# Two golden sets (committed, small text/nc files):
#
#  golden_utm/  — real-reanalysis regional run on the era5_utm32
#    fixture (the only met fixture shipped with the reference
#    checkout): advection + turbulent & mesoscale diffusion +
#    convection (computed CAPE) + decay + mixing + wet/dry deposition
#    + boundary conditions, RNG_TYPE 1 (Squares, bit-reproducible),
#    with atm/grid/station/csi/prof/sample/vtk/ens outputs.
#    Chemistry is excluded here because the reference aborts its chem
#    modules on Cartesian grids (mptrac.c:3892, 4801, 5897).
#
#  golden_chem/ — global lat/lon run on a synthetic solid-body wind
#    field minted with the reference `wind` tool (wind.c:62-101, the
#    dd_test generator): SPECIES SO2 with OH chemistry (termolecular,
#    JPL 19-05), H2O2 aqueous chemistry, first-order tracer chemistry,
#    chem grid, mixing, decay, convection, wet/dry deposition — the
#    trac_test physics set (tests/trac_test/run.sh:22-67) on a grid
#    the reference chem modules accept.
#
# The initial conditions are minted by the reference atm_init/atm_split
# (whose GSL shim is splitmix64, NOT upstream GSL — see
# shim/gslshim.c); the minted IC files are committed and shared by both
# sides, so the shim's stream choice cannot cause model divergence.
set -e
cd "$(dirname "$0")"
for t in trac atm_init atm_split time2jsec wind; do
  [ -x "bin/$t" ] || ./build_ref.sh trac atm_init atm_split time2jsec wind
done
export OMP_NUM_THREADS=4 LANG=C LC_ALL=C

# ---------------------------------------------------------------- utm
rm -rf golden_utm && mkdir -p golden_utm/data
(
cd golden_utm
t0=$(../bin/time2jsec 2025 5 1 0 0 0 0)
t1=$(../bin/time2jsec 2025 5 1 2 0 0 0)
tobs=$(../bin/time2jsec 2025 5 1 1 0 0 0)

cat > data/trac.ctl <<EOF
NQ = 9
QNT_NAME[0] = t
QNT_NAME[1] = u
QNT_NAME[2] = v
QNT_NAME[3] = w
QNT_NAME[4] = zg
QNT_NAME[5] = ps
QNT_NAME[6] = pt
QNT_NAME[7] = m
QNT_NAME[8] = stat
METBASE = /root/reference/tests/data/era5_utm32
MET_COORD_TYPE = 1
MET_UTM_REF_LON = 11.5692782
MET_UTM_REF_LAT = 48.1507476
MET_DT_OUT = 600
MET_TROPO = 0
MET_CAPE = 0
SPECIES = SO2
OH_CHEM_REACTION = 0
DIFFUSION = 1
TDEC_TROP = 259200.0
TDEC_STRAT = 259200.0
DRY_DEPO_VDEP = 0.15
DRY_DEPO_DP = 300
MIXING_TROP = 1e-3
MIXING_STRAT = 1e-6
MIXING_LON0 = 420000
MIXING_LON1 = 740000
MIXING_NX = 16
MIXING_LAT0 = 4980000
MIXING_LAT1 = 5560000
MIXING_NY = 29
BOUND_LAT0 = -1e10
BOUND_LAT1 = 1e10
BOUND_P0 = 1e10
BOUND_P1 = -1e10
BOUND_DPS = 100.0
BOUND_MASS = 0.0
DT_MET = 3600.0
DT_MOD = 120.0
ATM_DT_OUT = 600.0
T_STOP = $t1
CSI_OBSMIN = 1e-5
CSI_MODMIN = 1e-5
GRID_LON0 = 420000
GRID_LON1 = 740000
GRID_NX = 16
GRID_LAT0 = 4980000
GRID_LAT1 = 5560000
GRID_NY = 29
SAMPLE_DZ = 100
STAT_LON = 691090
STAT_LAT = 5336247
EOF

# Observation file on the UTM grid (x/y in place of lon/lat)
awk -v tobs="$tobs" 'BEGIN{
  for(x=500000; x<=700000; x+=20000)
    for(y=5000000; y<=5400000; y+=50000) {
      if(x>=620000 && x<=700000 && y>=5250000 && y<=5400000)
        obs=0.005
      else
        obs=0
      printf("%.2f %g %g %g %g\n", tobs, 0, x, y, obs)
    }
}' > data/obs.tab

../bin/atm_init data/trac.ctl data/atm_init.tab \
    INIT_T0 "$t0" INIT_T1 "$t0" INIT_Z0 2.0 INIT_Z1 2.0 \
    INIT_LON0 691090 INIT_LON1 691090 \
    INIT_LAT0 5336247 INIT_LAT1 5336247
../bin/atm_split data/trac.ctl data/atm_init.tab data/atm_split.tab \
    SPLIT_N 2000 SPLIT_M 1e9 SPLIT_DX 30.0 SPLIT_DZ 3.0

echo "data" > data/dirlist
# Cartesian grids support only particle output in the reference
# (write_grid/csi/station/... all ERRMSG, c:12871-14656); the gridded
# and observation outputs are exercised by the golden_chem set below.
../bin/trac data/dirlist trac.ctl atm_split.tab \
    ATM_BASENAME atm > trac.log 2>&1
tail -3 trac.log
)

# --------------------------------------------------------------- chem
rm -rf golden_chem && mkdir -p golden_chem/data
(
cd golden_chem
t0=$(../bin/time2jsec 2011 6 5 0 0 0 0)
t1=$(../bin/time2jsec 2011 6 5 2 0 0 0)
tobs=$(../bin/time2jsec 2011 6 5 1 0 0 0)

# Synthetic global met: solid-body wind rotated 30 deg, weak updraft,
# moist + ozone-bearing atmosphere so chemistry rates are non-trivial
cat > data/met.ctl <<EOF
MET_TROPO = 3
EOF
for h in 0 1 2; do
  ../bin/wind data/met.ctl data/met \
      WIND_T0 "$(../bin/time2jsec 2011 6 5 "$h" 0 0 0)" \
      WIND_NX 72 WIND_NY 37 WIND_NZ 30 WIND_Z1 60 \
      WIND_ALPHA 30.0 WIND_W0 0.001 \
      WIND_TEMP0 280 WIND_TEMP1 210 \
      WIND_IEWS 0.05 WIND_INSS 0.02 WIND_ISHF 10 \
      WIND_Q 0.003 WIND_O3 1e-7 WIND_BLH 1.0 >> wind.log 2>&1
done
# Convert the minted met files to classic netCDF-3 (same dtypes and
# values bit-for-bit) so both the reference (libnetcdf) and the
# framework (scipy netcdf3 reader) consume the identical fixtures.
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
    print("converted", path)
PYEOF
ls data/met_2011*.nc

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
DT_MET = 3600.0
DT_MOD = 120.0
ATM_DT_OUT = 600.0
GRID_DT_OUT = 3600.0
ENS_DT_OUT = 3600.0
CSI_DT_OUT = 3600.0
VTK_DT_OUT = 3600.0
T_STOP = $t1
CSI_OBSMIN = 1e-5
CSI_MODMIN = 1e-5
GRID_LON0 = -90
GRID_LON1 = 60
GRID_NX = 75
GRID_LAT0 = -60
GRID_LAT1 = -15
GRID_NY = 45
SAMPLE_DZ = 100
STAT_LON = -72
STAT_LAT = -40.5
STAT_R = 200
EOF

# Observations around the plume (release at -72.117, -40.59) so the
# csi/prof/sample/station writers see non-trivial model mass
awk -v tobs="$tobs" 'BEGIN{
  for(lon=-75; lon<=-69; lon+=0.25)
    for(lat=-43; lat<=-38; lat+=0.5) {
      if(lon>=-73 && lon<=-71 && lat>=-41.5 && lat<=-39.5)
        obs=0.005
      else
        obs=0
      printf("%.2f %g %g %g %g\n", tobs, 0, lon, lat, obs)
    }
}' > data/obs.tab

../bin/atm_init data/trac.ctl data/atm_init.tab \
    INIT_T0 "$t0" INIT_T1 "$t0" INIT_Z0 10.0 INIT_Z1 10.0 \
    INIT_LON0 -72.117 INIT_LON1 -72.117 \
    INIT_LAT0 -40.59 INIT_LAT1 -40.59
../bin/atm_split data/trac.ctl data/atm_init.tab data/atm_split.tab \
    SPLIT_N 2000 SPLIT_M 1e9 SPLIT_DX 30.0 SPLIT_DZ 5.0

echo "data" > data/dirlist
../bin/trac data/dirlist trac.ctl atm_split.tab \
    ATM_BASENAME atm GRID_BASENAME grid ENS_BASENAME ens \
    STAT_BASENAME station CSI_BASENAME csi CSI_OBSFILE data/obs.tab \
    PROF_BASENAME prof PROF_OBSFILE data/obs.tab \
    SAMPLE_BASENAME sample SAMPLE_OBSFILE data/obs.tab \
    VTK_BASENAME atm > trac.log 2>&1
tail -3 trac.log
)

echo "minted: golden_utm + golden_chem"
