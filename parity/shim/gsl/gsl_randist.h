#ifndef PARITY_GSL_RANDIST_H
#define PARITY_GSL_RANDIST_H

#include <gsl/gsl_rng.h>

double gsl_ran_gaussian_ziggurat(const gsl_rng *r, double sigma);

#endif
