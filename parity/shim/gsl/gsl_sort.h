#ifndef PARITY_GSL_SORT_H
#define PARITY_GSL_SORT_H

#include <stddef.h>

void gsl_sort(double *data, size_t stride, size_t n);
void gsl_sort_index(size_t *p, const double *data, size_t stride,
                    size_t n);

#endif
