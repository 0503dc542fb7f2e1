/* Minimal stand-in for gsl_cdf_binomial_Q built on the regularized
   incomplete beta function (standard continued-fraction evaluation).
   Used only to compile the reference binary as a local test oracle. */
#ifndef GSL_CDF_SHIM_H
#define GSL_CDF_SHIM_H
#include <math.h>

static double shim_betacf_(double a, double b, double x) {
  const int MAXIT = 300;
  const double EPS = 3e-16, FPMIN = 1e-300;
  double qab = a + b, qap = a + 1.0, qam = a - 1.0;
  double c = 1.0, d = 1.0 - qab * x / qap;
  if (fabs(d) < FPMIN) d = FPMIN;
  d = 1.0 / d;
  double h = d;
  for (int m = 1; m <= MAXIT; m++) {
    int m2 = 2 * m;
    double aa = m * (b - m) * x / ((qam + m2) * (a + m2));
    d = 1.0 + aa * d; if (fabs(d) < FPMIN) d = FPMIN;
    c = 1.0 + aa / c; if (fabs(c) < FPMIN) c = FPMIN;
    d = 1.0 / d; h *= d * c;
    aa = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2));
    d = 1.0 + aa * d; if (fabs(d) < FPMIN) d = FPMIN;
    c = 1.0 + aa / c; if (fabs(c) < FPMIN) c = FPMIN;
    d = 1.0 / d;
    double del = d * c; h *= del;
    if (fabs(del - 1.0) < EPS) break;
  }
  return h;
}

static double shim_betainc_(double a, double b, double x) {
  if (x <= 0.0) return 0.0;
  if (x >= 1.0) return 1.0;
  double bt = exp(lgamma(a + b) - lgamma(a) - lgamma(b)
                  + a * log(x) + b * log1p(-x));
  if (x < (a + 1.0) / (a + b + 2.0)) return bt * shim_betacf_(a, b, x) / a;
  return 1.0 - bt * shim_betacf_(b, a, 1.0 - x) / b;
}

static inline double gsl_cdf_binomial_Q(unsigned int k, double p, unsigned int n) {
  if (k >= n) return 0.0;            /* P(X > n) = 0 */
  if (p <= 0.0) return 0.0;
  if (p >= 1.0) return 1.0;
  return shim_betainc_((double)k + 1.0, (double)(n - k), p);
}
#endif
