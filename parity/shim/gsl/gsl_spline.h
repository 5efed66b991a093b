#ifndef PARITY_GSL_SPLINE_H
#define PARITY_GSL_SPLINE_H

#include <stddef.h>

typedef struct {
  size_t hint;
} gsl_interp_accel;

typedef struct {
  const char *name;
} gsl_interp_type;

extern const gsl_interp_type *gsl_interp_cspline;

typedef struct {
  size_t size;
  size_t n;
  double *x;
  double *y;
  double *c;   /* second-derivative coefficients (natural spline) */
} gsl_spline;

gsl_interp_accel *gsl_interp_accel_alloc(void);
void gsl_interp_accel_free(gsl_interp_accel *a);

gsl_spline *gsl_spline_alloc(const gsl_interp_type *T, size_t size);
int gsl_spline_init(gsl_spline *spline, const double xa[],
                    const double ya[], size_t size);
double gsl_spline_eval(const gsl_spline *spline, double x,
                       gsl_interp_accel *a);
void gsl_spline_free(gsl_spline *spline);

#endif
