#ifndef PARITY_GSL_RNG_H
#define PARITY_GSL_RNG_H

#include <stddef.h>

typedef struct {
  const char *name;
} gsl_rng_type;

typedef struct {
  unsigned long long state;
} gsl_rng;

extern const gsl_rng_type *gsl_rng_default;
extern unsigned long int gsl_rng_default_seed;

void gsl_rng_env_setup(void);
gsl_rng *gsl_rng_alloc(const gsl_rng_type *T);
void gsl_rng_set(const gsl_rng *r, unsigned long int seed);
void gsl_rng_free(gsl_rng *r);
double gsl_rng_uniform(const gsl_rng *r);
double gsl_rng_uniform_pos(const gsl_rng *r);
unsigned long int gsl_rng_uniform_int(const gsl_rng *r,
                                      unsigned long int n);

#endif
