/* GSL shim implementation for the golden-parity harness.
 *
 * Provides the subset of GSL the reference model links against, with
 * GSL-documented semantics for the statistics / sort / natural-cubic-
 * spline functions (these shape diagnostic outputs), and a generic
 * splitmix64-based RNG for gsl_rng (parity runs pin RNG_TYPE 1 =
 * Squares, which never touches gsl_rng; the tools that do use it,
 * atm_init/atm_split, produce an initial-condition file that is saved
 * as a fixture and fed identically to both models, so the gsl stream
 * itself need not match upstream GSL).
 */

#include <math.h>
#include <stdlib.h>
#include <string.h>

#include <gsl/gsl_fft_complex.h>
#include <gsl/gsl_randist.h>
#include <gsl/gsl_rng.h>
#include <gsl/gsl_sort.h>
#include <gsl/gsl_spline.h>
#include <gsl/gsl_statistics.h>

/* ---------------- rng ---------------- */

static const gsl_rng_type default_type = {"shim-splitmix64"};
const gsl_rng_type *gsl_rng_default = &default_type;
unsigned long int gsl_rng_default_seed = 0;

void
gsl_rng_env_setup(void) {
  const char *s = getenv("GSL_RNG_SEED");
  if (s)
    gsl_rng_default_seed = strtoul(s, NULL, 10);
}

gsl_rng *
gsl_rng_alloc(const gsl_rng_type *T) {
  (void) T;
  gsl_rng *r = malloc(sizeof(gsl_rng));
  r->state = gsl_rng_default_seed * 0x9E3779B97F4A7C15ULL
    + 0x9E3779B97F4A7C15ULL;
  return r;
}

void
gsl_rng_set(const gsl_rng *r, unsigned long int seed) {
  ((gsl_rng *) (void *) r)->state =
    (unsigned long long) seed * 0x9E3779B97F4A7C15ULL
    + 0x9E3779B97F4A7C15ULL;
}

void
gsl_rng_free(gsl_rng *r) {
  free(r);
}

static unsigned long long
splitmix64(unsigned long long *s) {
  unsigned long long z = (*s += 0x9E3779B97F4A7C15ULL);
  z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
  z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
  return z ^ (z >> 31);
}

double
gsl_rng_uniform(const gsl_rng *r) {
  return (double) (splitmix64(&((gsl_rng *) (void *) r)->state) >> 11)
    * 0x1.0p-53;
}

double
gsl_rng_uniform_pos(const gsl_rng *r) {
  double u;
  do {
    u = gsl_rng_uniform(r);
  } while (u <= 0.0);
  return u;
}

unsigned long int
gsl_rng_uniform_int(const gsl_rng *r, unsigned long int n) {
  return (unsigned long int)
    (splitmix64(&((gsl_rng *) (void *) r)->state) % n);
}

double
gsl_ran_gaussian_ziggurat(const gsl_rng *r, double sigma) {
  /* polar Box-Muller (any correct normal sampler works here) */
  double u, v, s;
  do {
    u = 2.0 * gsl_rng_uniform(r) - 1.0;
    v = 2.0 * gsl_rng_uniform(r) - 1.0;
    s = u * u + v * v;
  } while (s >= 1.0 || s == 0.0);
  return sigma * u * sqrt(-2.0 * log(s) / s);
}

/* ---------------- statistics ---------------- */

double
gsl_stats_mean(const double data[], size_t stride, size_t n) {
  double mean = 0.0;
  for (size_t i = 0; i < n; i++)
    mean += (data[i * stride] - mean) / (double) (i + 1);
  return mean;
}

double
gsl_stats_tss_m(const double data[], size_t stride, size_t n,
                double mean) {
  double tss = 0.0;
  for (size_t i = 0; i < n; i++) {
    const double d = data[i * stride] - mean;
    tss += d * d;
  }
  return tss;
}

static double
variance_m(const double data[], size_t stride, size_t n, double mean) {
  double var = 0.0;
  for (size_t i = 0; i < n; i++) {
    const double d = data[i * stride] - mean;
    var += (d * d - var) / (double) (i + 1);
  }
  return var * (double) n / (double) (n - 1);
}

double
gsl_stats_sd(const double data[], size_t stride, size_t n) {
  return sqrt(variance_m(data, stride, n,
                         gsl_stats_mean(data, stride, n)));
}

double
gsl_stats_sd_with_fixed_mean(const double data[], size_t stride,
                             size_t n, double mean) {
  double var = 0.0;
  for (size_t i = 0; i < n; i++) {
    const double d = data[i * stride] - mean;
    var += (d * d - var) / (double) (i + 1);
  }
  return sqrt(var);
}

double
gsl_stats_min(const double data[], size_t stride, size_t n) {
  double m = data[0];
  for (size_t i = 1; i < n; i++)
    if (data[i * stride] < m)
      m = data[i * stride];
  return m;
}

double
gsl_stats_max(const double data[], size_t stride, size_t n) {
  double m = data[0];
  for (size_t i = 1; i < n; i++)
    if (data[i * stride] > m)
      m = data[i * stride];
  return m;
}

void
gsl_stats_minmax(double *min, double *max, const double data[],
                 size_t stride, size_t n) {
  double lo = data[0], hi = data[0];
  for (size_t i = 1; i < n; i++) {
    const double x = data[i * stride];
    if (x < lo)
      lo = x;
    if (x > hi)
      hi = x;
  }
  *min = lo;
  *max = hi;
}

size_t
gsl_stats_min_index(const double data[], size_t stride, size_t n) {
  size_t idx = 0;
  double m = data[0];
  for (size_t i = 1; i < n; i++)
    if (data[i * stride] < m) {
      m = data[i * stride];
      idx = i;
    }
  return idx;
}

static int
cmp_double(const void *a, const void *b) {
  const double x = *(const double *) a, y = *(const double *) b;
  return (x > y) - (x < y);
}

static double
median_sorted(const double *s, size_t n) {
  if (n % 2)
    return s[n / 2];
  return (s[n / 2 - 1] + s[n / 2]) / 2.0;
}

double
gsl_stats_median(double data[], size_t stride, size_t n) {
  /* GSL rearranges in place; copying keeps callers' data intact and
     yields the identical median value */
  double *tmp = malloc(n * sizeof(double));
  for (size_t i = 0; i < n; i++)
    tmp[i] = data[i * stride];
  qsort(tmp, n, sizeof(double), cmp_double);
  const double m = median_sorted(tmp, n);
  free(tmp);
  return m;
}

double
gsl_stats_mad0(const double data[], size_t stride, size_t n,
               double work[]) {
  for (size_t i = 0; i < n; i++)
    work[i] = data[i * stride];
  const double med = gsl_stats_median(work, 1, n);
  for (size_t i = 0; i < n; i++)
    work[i] = fabs(data[i * stride] - med);
  return gsl_stats_median(work, 1, n);
}

double
gsl_stats_skew(const double data[], size_t stride, size_t n) {
  const double mean = gsl_stats_mean(data, stride, n);
  const double sd = sqrt(variance_m(data, stride, n, mean));
  double skew = 0.0;
  for (size_t i = 0; i < n; i++) {
    const double x = (data[i * stride] - mean) / sd;
    skew += (x * x * x - skew) / (double) (i + 1);
  }
  return skew;
}

double
gsl_stats_kurtosis(const double data[], size_t stride, size_t n) {
  const double mean = gsl_stats_mean(data, stride, n);
  const double sd = sqrt(variance_m(data, stride, n, mean));
  double avg = 0.0;
  for (size_t i = 0; i < n; i++) {
    const double x = (data[i * stride] - mean) / sd;
    avg += (x * x * x * x - avg) / (double) (i + 1);
  }
  return avg - 3.0;
}

double
gsl_stats_absdev_m(const double data[], size_t stride, size_t n,
                   double mean) {
  double s = 0.0;
  for (size_t i = 0; i < n; i++)
    s += fabs(data[i * stride] - mean);
  return s / (double) n;
}

double
gsl_stats_absdev(const double data[], size_t stride, size_t n) {
  return gsl_stats_absdev_m(data, stride, n,
                            gsl_stats_mean(data, stride, n));
}

double
gsl_stats_correlation(const double data1[], size_t stride1,
                      const double data2[], size_t stride2, size_t n) {
  /* GSL's one-pass stable recurrence (Welford-style) */
  double sum_xsq = 0.0, sum_ysq = 0.0, sum_cross = 0.0;
  double mean_x = data1[0], mean_y = data2[0];
  for (size_t i = 1; i < n; i++) {
    const double ratio = (double) i / (double) (i + 1);
    const double dx = data1[i * stride1] - mean_x;
    const double dy = data2[i * stride2] - mean_y;
    sum_xsq += dx * dx * ratio;
    sum_ysq += dy * dy * ratio;
    sum_cross += dx * dy * ratio;
    mean_x += dx / (double) (i + 1);
    mean_y += dy / (double) (i + 1);
  }
  return sum_cross / (sqrt(sum_xsq) * sqrt(sum_ysq));
}

static void
rank_with_ties(double *dst, const double *data, size_t stride,
               size_t n, size_t *perm) {
  gsl_sort_index(perm, data, stride, n);
  size_t i = 0;
  while (i < n) {
    size_t j = i + 1;
    while (j < n
           && data[perm[j] * stride] == data[perm[i] * stride])
      j++;
    const double rank = 0.5 * (double) (i + j - 1) + 1.0;
    for (size_t k = i; k < j; k++)
      dst[perm[k]] = rank;
    i = j;
  }
}

double
gsl_stats_spearman(const double data1[], size_t stride1,
                   const double data2[], size_t stride2, size_t n,
                   double work[]) {
  double *r1 = work, *r2 = work + n;
  size_t *perm = malloc(n * sizeof(size_t));
  rank_with_ties(r1, data1, stride1, n, perm);
  rank_with_ties(r2, data2, stride2, n, perm);
  free(perm);
  return gsl_stats_correlation(r1, 1, r2, 1, n);
}

/* ---------------- sort ---------------- */

void
gsl_sort(double *data, size_t stride, size_t n) {
  if (stride == 1) {
    qsort(data, n, sizeof(double), cmp_double);
    return;
  }
  double *tmp = malloc(n * sizeof(double));
  for (size_t i = 0; i < n; i++)
    tmp[i] = data[i * stride];
  qsort(tmp, n, sizeof(double), cmp_double);
  for (size_t i = 0; i < n; i++)
    data[i * stride] = tmp[i];
  free(tmp);
}

struct idx_pair {
  double v;
  size_t i;
};

static int
cmp_idx(const void *a, const void *b) {
  const struct idx_pair *x = a, *y = b;
  if (x->v != y->v)
    return (x->v > y->v) - (x->v < y->v);
  /* break ties by index: a stable order (GSL's heapsort is unstable,
     but callers only require a valid sort permutation) */
  return (x->i > y->i) - (x->i < y->i);
}

void
gsl_sort_index(size_t *p, const double *data, size_t stride,
               size_t n) {
  struct idx_pair *tmp = malloc(n * sizeof(struct idx_pair));
  for (size_t i = 0; i < n; i++) {
    tmp[i].v = data[i * stride];
    tmp[i].i = i;
  }
  qsort(tmp, n, sizeof(struct idx_pair), cmp_idx);
  for (size_t i = 0; i < n; i++)
    p[i] = tmp[i].i;
  free(tmp);
}

/* ---------------- spline (natural cubic) ---------------- */

static const gsl_interp_type cspline_type = {"cspline"};
const gsl_interp_type *gsl_interp_cspline = &cspline_type;

gsl_interp_accel *
gsl_interp_accel_alloc(void) {
  gsl_interp_accel *a = malloc(sizeof(gsl_interp_accel));
  a->hint = 0;
  return a;
}

void
gsl_interp_accel_free(gsl_interp_accel *a) {
  free(a);
}

gsl_spline *
gsl_spline_alloc(const gsl_interp_type *T, size_t size) {
  (void) T;
  gsl_spline *s = malloc(sizeof(gsl_spline));
  s->size = size;
  s->n = size;
  s->x = malloc(size * sizeof(double));
  s->y = malloc(size * sizeof(double));
  s->c = malloc(size * sizeof(double));
  return s;
}

int
gsl_spline_init(gsl_spline *s, const double xa[], const double ya[],
                size_t size) {
  memcpy(s->x, xa, size * sizeof(double));
  memcpy(s->y, ya, size * sizeof(double));
  s->n = size;
  /* natural cubic spline: solve the tridiagonal system for the
     second derivatives c[i] (c[0] = c[n-1] = 0) */
  const size_t n = size;
  double *sub = calloc(n, sizeof(double));
  double *diag = calloc(n, sizeof(double));
  double *rhs = calloc(n, sizeof(double));
  s->c[0] = 0.0;
  s->c[n - 1] = 0.0;
  if (n > 2) {
    /* Thomas algorithm on rows 1..n-2; the upper diagonal of row i
       equals the lower diagonal of row i+1 (both are h at x[i]) */
    for (size_t i = 1; i + 1 < n; i++) {
      const double h0 = xa[i] - xa[i - 1];
      const double h1 = xa[i + 1] - xa[i];
      sub[i] = h0;
      diag[i] = 2.0 * (h0 + h1);
      rhs[i] = 6.0 * ((ya[i + 1] - ya[i]) / h1
                      - (ya[i] - ya[i - 1]) / h0);
    }
    for (size_t i = 2; i + 1 < n; i++) {
      const double up_prev = xa[i] - xa[i - 1]; /* upper diag of row i-1 */
      const double m = sub[i] / diag[i - 1];
      diag[i] -= m * up_prev;
      rhs[i] -= m * rhs[i - 1];
    }
    s->c[n - 2] = rhs[n - 2] / diag[n - 2];
    for (size_t i = n - 2; i >= 2; i--) {
      const double up = xa[i] - xa[i - 1]; /* upper diag of row i-1 */
      s->c[i - 1] = (rhs[i - 1] - up * s->c[i]) / diag[i - 1];
    }
  }
  free(sub);
  free(diag);
  free(rhs);
  return 0;
}

double
gsl_spline_eval(const gsl_spline *s, double x, gsl_interp_accel *a) {
  (void) a;
  const size_t n = s->n;
  size_t i = 0;
  if (x <= s->x[0])
    i = 0;
  else if (x >= s->x[n - 2])
    i = n - 2;
  else {
    size_t lo = 0, hi = n - 1;
    while (hi - lo > 1) {
      const size_t mid = (lo + hi) / 2;
      if (s->x[mid] > x)
        hi = mid;
      else
        lo = mid;
    }
    i = lo;
  }
  const double h = s->x[i + 1] - s->x[i];
  const double A = (s->x[i + 1] - x) / h;
  const double B = (x - s->x[i]) / h;
  return A * s->y[i] + B * s->y[i + 1]
    + ((A * A * A - A) * s->c[i] + (B * B * B - B) * s->c[i + 1])
    * (h * h) / 6.0;
}

void
gsl_spline_free(gsl_spline *s) {
  free(s->x);
  free(s->y);
  free(s->c);
  free(s);
}

/* ---------------- fft (naive DFT; met_spec only) ---------------- */

gsl_fft_complex_wavetable *
gsl_fft_complex_wavetable_alloc(size_t n) {
  gsl_fft_complex_wavetable *w = malloc(sizeof(*w));
  w->n = n;
  return w;
}

void
gsl_fft_complex_wavetable_free(gsl_fft_complex_wavetable *w) {
  free(w);
}

gsl_fft_complex_workspace *
gsl_fft_complex_workspace_alloc(size_t n) {
  gsl_fft_complex_workspace *w = malloc(sizeof(*w));
  w->n = n;
  w->scratch = malloc(2 * n * sizeof(double));
  return w;
}

void
gsl_fft_complex_workspace_free(gsl_fft_complex_workspace *w) {
  free(w->scratch);
  free(w);
}

int
gsl_fft_complex_forward(double data[], size_t stride, size_t n,
                        const gsl_fft_complex_wavetable *wavetable,
                        gsl_fft_complex_workspace *work) {
  (void) wavetable;
  double *out = work->scratch;
  for (size_t k = 0; k < n; k++) {
    double re = 0.0, im = 0.0;
    for (size_t j = 0; j < n; j++) {
      const double ang = -2.0 * M_PI * (double) (k * j) / (double) n;
      const double c = cos(ang), si = sin(ang);
      const double xr = data[2 * j * stride];
      const double xi = data[2 * j * stride + 1];
      re += xr * c - xi * si;
      im += xr * si + xi * c;
    }
    out[2 * k] = re;
    out[2 * k + 1] = im;
  }
  for (size_t k = 0; k < n; k++) {
    data[2 * k * stride] = out[2 * k];
    data[2 * k * stride + 1] = out[2 * k + 1];
  }
  return 0;
}
