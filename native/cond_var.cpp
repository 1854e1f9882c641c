// Greedy ConditionalVariance inducing-point selection — native host runtime.
//
// C++ replacement for the robustgp numpy implementation the reference
// delegates to (reference: cglb/backend/config.py:62-65 via a numpy kernel
// bridge at cglb/backend/pytorch/interface.py:278-288).  The selection is
// inherently sequential in M (each pivot depends on the previous rank-1
// downdate), so the wins are a cache-friendly transposed pivot matrix and
// OpenMP parallelism over N inside each step: O(N M D) kernel evaluations +
// O(N M^2) downdate flops, O(N M) memory.
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
//
// Algorithm (pivoted-Cholesky form):
//   d_i   = k(x_i, x_i) + jitter                  (conditional variances)
//   pick j = argmax d; then for each new pivot j:
//     e_i = (k(x_i, x_j) - sum_m c_m,i c_m,j) / sqrt(d_j)
//     c_rank,i = e_i;  d_i -= e_i^2;  next pivot = argmax d
//
// Kernels: 0 = SquaredExponential, 1 = Matern32 (ARD lengthscales), matching
// cglb_tpu/ops/kernels.py.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline double kernel_value(int family, double variance, double d2) {
  if (family == 0) {  // rbf
    return variance * std::exp(-0.5 * d2);
  }
  // matern32
  const double r = std::sqrt(d2);
  const double s3r = 1.7320508075688772 * r;
  return variance * (1.0 + s3r) * std::exp(-s3r);
}

}  // namespace

extern "C" {

// Xs: [N, D] row-major inputs ALREADY divided by lengthscales (the caller
//     pre-scales; keeps this ABI kernel-parameter-free beyond variance).
// out_indices: [M] selected row indices into Xs.
// Returns 0 on success, nonzero on bad arguments.
int cglb_conditional_variance(const double* Xs, int64_t N, int64_t D,
                              int64_t M, int family, double variance,
                              double jitter, int64_t* out_indices) {
  if (Xs == nullptr || out_indices == nullptr || N <= 0 || D <= 0 || M <= 0 ||
      M > N || (family != 0 && family != 1)) {
    return 1;
  }

  std::vector<double> di(static_cast<size_t>(N));
  std::vector<double> kcol(static_cast<size_t>(N));
  const double kdiag = variance;  // stationary kernels: k(x,x) = variance
  for (int64_t i = 0; i < N; ++i) di[i] = kdiag + jitter;

  // Pivot matrix stored TRANSPOSED, [N, M-1] row-major: the per-row projection
  // loop over previous pivots is then contiguous (the hot O(N M^2) access).
  const int64_t R = M > 1 ? M - 1 : 0;
  std::vector<double> ciT;
  if (R > 0) ciT.assign(static_cast<size_t>(N * R), 0.0);

  // first pivot: argmax d
  int64_t j = 0;
  for (int64_t i = 1; i < N; ++i)
    if (di[i] > di[j]) j = i;
  out_indices[0] = j;

  for (int64_t m = 0; m < R; ++m) {
    j = out_indices[m];
    const double dj = std::sqrt(di[j]);
    const double* xj = Xs + j * D;
    const double* cj = ciT.data() + j * R;  // previous pivot row at column j

// pass 1: kernel column.  A separate loop so the exp/sqrt scoring pass
// auto-vectorizes (libmvec under -Ofast; the projection loop below has a
// variable-trip inner dot that would otherwise keep the exp scalar).
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < N; ++i) {
      const double* xi = Xs + i * D;
      double d2 = 0.0;
      for (int64_t d = 0; d < D; ++d) {
        const double diff = xi[d] - xj[d];
        d2 += diff * diff;
      }
      kcol[i] = kernel_value(family, variance, d2);
    }
    kcol[j] += jitter;

// pass 2: projection + downdate, parallel over rows
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < N; ++i) {
      // subtract sum_m' c_m',i * c_m',j over previous pivots (contiguous)
      double* ci_row = ciT.data() + i * R;
      double proj = 0.0;
      for (int64_t mp = 0; mp < m; ++mp) proj += ci_row[mp] * cj[mp];
      const double e = (kcol[i] - proj) / dj;
      ci_row[m] = e;
      double dnew = di[i] - e * e;
      di[i] = dnew > 0.0 ? dnew : 0.0;
    }

    // next pivot
    int64_t jn = 0;
    for (int64_t i = 1; i < N; ++i)
      if (di[i] > di[jn]) jn = i;
    out_indices[m + 1] = jn;
  }
  return 0;
}

// Introspection helper for the ctypes wrapper / tests.
int cglb_native_version() { return 1; }

}  // extern "C"
