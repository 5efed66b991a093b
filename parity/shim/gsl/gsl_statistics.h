#ifndef PARITY_GSL_STATISTICS_H
#define PARITY_GSL_STATISTICS_H

#include <stddef.h>

double gsl_stats_mean(const double data[], size_t stride, size_t n);
double gsl_stats_sd(const double data[], size_t stride, size_t n);
double gsl_stats_sd_with_fixed_mean(const double data[], size_t stride,
                                    size_t n, double mean);
double gsl_stats_tss_m(const double data[], size_t stride, size_t n,
                       double mean);
double gsl_stats_min(const double data[], size_t stride, size_t n);
double gsl_stats_max(const double data[], size_t stride, size_t n);
void gsl_stats_minmax(double *min, double *max, const double data[],
                      size_t stride, size_t n);
size_t gsl_stats_min_index(const double data[], size_t stride,
                           size_t n);
double gsl_stats_median(double data[], size_t stride, size_t n);
double gsl_stats_mad0(const double data[], size_t stride, size_t n,
                      double work[]);
double gsl_stats_skew(const double data[], size_t stride, size_t n);
double gsl_stats_kurtosis(const double data[], size_t stride,
                          size_t n);
double gsl_stats_absdev(const double data[], size_t stride, size_t n);
double gsl_stats_absdev_m(const double data[], size_t stride, size_t n,
                          double mean);
double gsl_stats_correlation(const double data1[], size_t stride1,
                             const double data2[], size_t stride2,
                             size_t n);
double gsl_stats_spearman(const double data1[], size_t stride1,
                          const double data2[], size_t stride2,
                          size_t n, double work[]);

#endif
