#!/bin/bash
# Build the reference model (read-only at /root/reference) against the
# header shims in parity/shim, for minting golden-parity fixtures.
# The image ships libnetcdf.so.19 without headers and no GSL at all;
# parity/shim provides both (see shim/netcdf.h, shim/gslshim.c).
#
# Usage: parity/build_ref.sh [tool...]   (default: the parity set)
set -e
cd "$(dirname "$0")"

REF=/root/reference/src
CFLAGS="-O2 -g -fopenmp -Ishim -I$REF -DHAVE_INLINE -DVERSION=\"parity\""
LDLIBS="-l:libnetcdf.so.19 -lm"

mkdir -p bin build

gcc $CFLAGS -c shim/gslshim.c -o build/gslshim.o
gcc $CFLAGS -c "$REF/mptrac.c" -o build/mptrac.o -w

TOOLS="${@:-trac atm_init atm_split atm_conv time2jsec atm_dist atm_stat}"
for t in $TOOLS; do
  gcc $CFLAGS -w "$REF/$t.c" build/mptrac.o build/gslshim.o \
      -o "bin/$t" $LDLIBS
  echo "built bin/$t"
done
