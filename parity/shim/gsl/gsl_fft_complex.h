#ifndef PARITY_GSL_FFT_COMPLEX_H
#define PARITY_GSL_FFT_COMPLEX_H

#include <stddef.h>

typedef struct {
  size_t n;
} gsl_fft_complex_wavetable;

typedef struct {
  size_t n;
  double *scratch;
} gsl_fft_complex_workspace;

gsl_fft_complex_wavetable *gsl_fft_complex_wavetable_alloc(size_t n);
void gsl_fft_complex_wavetable_free(gsl_fft_complex_wavetable *w);
gsl_fft_complex_workspace *gsl_fft_complex_workspace_alloc(size_t n);
void gsl_fft_complex_workspace_free(gsl_fft_complex_workspace *w);

int gsl_fft_complex_forward(double data[], size_t stride, size_t n,
                            const gsl_fft_complex_wavetable *wavetable,
                            gsl_fft_complex_workspace *work);

#endif
