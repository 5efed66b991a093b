/* Minimal GSL shim for the golden-parity harness (parity/build_ref.sh):
 * the image has no GSL, so these headers + gslshim.c provide the ~30
 * symbols the reference uses.  Statistics / spline / sort semantics
 * match GSL's documented definitions; the RNG is a generic generator
 * (reference runs use RNG_TYPE 1 = Squares, which bypasses gsl_rng for
 * everything that must be bit-reproducible). */
#ifndef PARITY_GSL_MATH_H
#define PARITY_GSL_MATH_H

#include <math.h>

#define GSL_NAN (nan(""))
#define GSL_MIN(a, b) ((a) < (b) ? (a) : (b))
#define GSL_MAX(a, b) ((a) > (b) ? (a) : (b))

static inline double gsl_pow_2(const double x) { return x * x; }
static inline double gsl_pow_3(const double x) { return x * x * x; }

#endif
