// L-BFGS with strong-Wolfe line search — native host optimizer driver.
//
// Native replacement for the optimizer-driver role that the reference fills
// with scipy's Fortran L-BFGS-B (cglb/backend/pytorch/optimizer.py:20-28,
// gpflow Scipy at tensorflow/interface.py:309-322) and a vendored torch
// FullBatchLBFGS (cglb/backend/pytorch/lbfgs.py — two-loop recursion + Wolfe
// line searches).  The device does all heavy math (jitted value_and_grad);
// this code only handles the O(n * history) two-loop recursion and the line
// search control flow, so a reverse-communication C ABI keeps Python/JAX in
// charge of function evaluations:
//
//   h = cglb_lbfgs_create(n, history, c1, c2, max_linesearch);
//   x = x0;
//   loop {
//     (f, g) = evaluate(x);                        // device
//     status = cglb_lbfgs_step(h, x, f, g, x_next); // host, O(n*m)
//     if (status == LBFGS_CONVERGED || status == LBFGS_FAIL) break;
//     x = x_next;                                   // evaluate here next
//     if (status == LBFGS_ACCEPTED) iterations++;   // new iterate accepted
//   }
//   cglb_lbfgs_destroy(h);
//
// Status: 0 = keep evaluating (line search in progress), 1 = iterate
// accepted, 2 = converged (gtol), 3 = failure.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int kEvaluate = 0;
constexpr int kAccepted = 1;
constexpr int kConverged = 2;
constexpr int kFail = 3;

struct LbfgsState {
  int64_t n = 0;
  int history = 10;
  double c1 = 1e-4;
  double c2 = 0.9;
  int max_linesearch = 25;
  double gtol = 1e-9;

  // accepted iterate
  std::vector<double> x0, g0;
  double f0 = 0.0;
  bool have_iterate = false;

  // s/y circular history
  std::vector<std::vector<double>> s, y;
  std::vector<double> rho;
  int n_pairs = 0, head = 0;

  // current line search
  std::vector<double> dir;
  double dg0 = 0.0;   // phi'(0)
  double alpha = 1.0;
  double alpha_lo = 0.0, f_lo = 0.0, dg_lo = 0.0;
  double alpha_hi = 0.0, f_hi = 0.0;
  bool bracketed = false;
  int ls_iter = 0;
  double alpha_prev = 0.0, f_prev = 0.0;
};

double dot(const double* a, const double* b, int64_t n) {
  double s = 0.0;
  for (int64_t i = 0; i < n; ++i) s += a[i] * b[i];
  return s;
}

double norm_inf(const double* a, int64_t n) {
  double m = 0.0;
  for (int64_t i = 0; i < n; ++i) m = std::max(m, std::fabs(a[i]));
  return m;
}

// two-loop recursion: dir = -H g
void compute_direction(LbfgsState* st, const double* g) {
  const int64_t n = st->n;
  st->dir.assign(g, g + n);
  std::vector<double> alpha_buf(st->n_pairs);
  for (int k = st->n_pairs - 1; k >= 0; --k) {
    const int idx = (st->head + k) % st->history;
    const double a = st->rho[idx] * dot(st->s[idx].data(), st->dir.data(), n);
    alpha_buf[k] = a;
    for (int64_t i = 0; i < n; ++i) st->dir[i] -= a * st->y[idx][i];
  }
  if (st->n_pairs > 0) {
    const int last = (st->head + st->n_pairs - 1) % st->history;
    const double ys = 1.0 / st->rho[last];
    const double yy = dot(st->y[last].data(), st->y[last].data(), n);
    const double gamma = ys / yy;
    for (int64_t i = 0; i < n; ++i) st->dir[i] *= gamma;
  }
  for (int k = 0; k < st->n_pairs; ++k) {
    const int idx = (st->head + k) % st->history;
    const double b = st->rho[idx] * dot(st->y[idx].data(), st->dir.data(), n);
    for (int64_t i = 0; i < n; ++i)
      st->dir[i] += (alpha_buf[k] - b) * st->s[idx][i];
  }
  for (int64_t i = 0; i < n; ++i) st->dir[i] = -st->dir[i];
}

void push_pair(LbfgsState* st, const std::vector<double>& s_vec,
               const std::vector<double>& y_vec) {
  const double ys = dot(s_vec.data(), y_vec.data(), st->n);
  if (ys <= 1e-12) return;  // curvature pair rejected (reference lbfgs.py
                            // rejects damped pairs similarly)
  int idx;
  if (st->n_pairs < st->history) {
    idx = (st->head + st->n_pairs) % st->history;
    st->n_pairs += 1;
  } else {
    idx = st->head;
    st->head = (st->head + 1) % st->history;
  }
  st->s[idx] = s_vec;
  st->y[idx] = y_vec;
  st->rho[idx] = 1.0 / ys;
}

void set_trial(LbfgsState* st, double a, double* x_out) {
  st->alpha = a;
  for (int64_t i = 0; i < st->n; ++i)
    x_out[i] = st->x0[i] + a * st->dir[i];
}

void accept(LbfgsState* st, const double* x, double f, const double* g) {
  std::vector<double> s_vec(st->n), y_vec(st->n);
  for (int64_t i = 0; i < st->n; ++i) {
    s_vec[i] = x[i] - st->x0[i];
    y_vec[i] = g[i] - st->g0[i];
  }
  push_pair(st, s_vec, y_vec);
  st->x0.assign(x, x + st->n);
  st->g0.assign(g, g + st->n);
  st->f0 = f;
}

double interp_quadratic(double a_lo, double f_lo, double dg_lo, double a_hi,
                        double f_hi) {
  // minimizer of the quadratic through (a_lo, f_lo, dg_lo) and (a_hi, f_hi)
  const double denom = 2.0 * (f_hi - f_lo - dg_lo * (a_hi - a_lo));
  if (std::fabs(denom) < 1e-300) return 0.5 * (a_lo + a_hi);
  const double a = a_lo + dg_lo * (a_hi - a_lo) * (a_hi - a_lo) / (-denom);
  const double lo = std::min(a_lo, a_hi), hi = std::max(a_lo, a_hi);
  const double margin = 0.1 * (hi - lo);
  if (!(a > lo + margin && a < hi - margin)) return 0.5 * (a_lo + a_hi);
  return a;
}

}  // namespace

extern "C" {

void* cglb_lbfgs_create(int64_t n, int history, double c1, double c2,
                        int max_linesearch, double gtol) {
  auto* st = new LbfgsState();
  st->n = n;
  st->history = history > 0 ? history : 10;
  st->c1 = c1;
  st->c2 = c2;
  st->max_linesearch = max_linesearch > 0 ? max_linesearch : 25;
  st->gtol = gtol;
  st->s.assign(st->history, {});
  st->y.assign(st->history, {});
  st->rho.assign(st->history, 0.0);
  return st;
}

void cglb_lbfgs_destroy(void* handle) {
  delete static_cast<LbfgsState*>(handle);
}

int cglb_lbfgs_step(void* handle, const double* x, double f, const double* g,
                    double* x_out) {
  auto* st = static_cast<LbfgsState*>(handle);
  const int64_t n = st->n;

  // non-finite evaluations (NaN/Inf loss or gradient) are treated as +inf so
  // the line search backs off instead of corrupting state (the reference's
  // vendored LBFGS guards the same way with is_legal, lbfgs.py:16-24)
  bool finite = std::isfinite(f);
  for (int64_t i = 0; finite && i < n; ++i) finite = std::isfinite(g[i]);
  if (!finite) {
    if (!st->have_iterate) return kFail;  // bad starting point
    f = std::numeric_limits<double>::max();
  }

  if (!st->have_iterate) {
    // first call: x is the accepted starting iterate
    st->x0.assign(x, x + n);
    st->g0.assign(g, g + n);
    st->f0 = f;
    st->have_iterate = true;
    if (norm_inf(g, n) < st->gtol) return kConverged;
    compute_direction(st, g);
    st->dg0 = dot(st->dir.data(), g, n);
    if (st->dg0 >= 0.0) return kFail;  // not a descent direction
    st->bracketed = false;
    st->ls_iter = 0;
    st->alpha_prev = 0.0;
    st->f_prev = st->f0;
    st->alpha_lo = 0.0;
    st->f_lo = st->f0;
    st->dg_lo = st->dg0;
    set_trial(st, 1.0, x_out);
    return kEvaluate;
  }

  // line-search evaluation at st->alpha with value f, grad g
  const double dg = dot(st->dir.data(), g, n);
  st->ls_iter += 1;
  const bool armijo = f <= st->f0 + st->c1 * st->alpha * st->dg0;
  const bool wolfe = std::fabs(dg) <= st->c2 * std::fabs(st->dg0);

  bool accept_point = false;
  if (armijo && wolfe) {
    accept_point = true;
  } else if (st->ls_iter >= st->max_linesearch) {
    // take the best point seen if it decreased f; else fail
    if (f < st->f0) {
      accept_point = true;
    } else {
      return kFail;
    }
  }

  if (accept_point) {
    std::vector<double> xv(x, x + n);
    accept(st, xv.data(), f, g);
    if (norm_inf(g, n) < st->gtol) return kConverged;
    // start a fresh direction from the new iterate
    compute_direction(st, st->g0.data());
    st->dg0 = dot(st->dir.data(), st->g0.data(), n);
    if (st->dg0 >= 0.0) {
      // reset history and retry with steepest descent
      st->n_pairs = 0;
      st->head = 0;
      compute_direction(st, st->g0.data());
      st->dg0 = dot(st->dir.data(), st->g0.data(), n);
      if (st->dg0 >= 0.0) return kFail;
    }
    st->bracketed = false;
    st->ls_iter = 0;
    st->alpha_lo = 0.0;
    st->f_lo = st->f0;
    st->dg_lo = st->dg0;
    set_trial(st, 1.0, x_out);
    // status: iterate accepted; caller should evaluate x_out next
    return kAccepted;
  }

  // continue the line search
  if (!st->bracketed) {
    if (!armijo || f >= st->f_lo) {
      // bracket found between alpha_lo and alpha
      st->alpha_hi = st->alpha;
      st->f_hi = f;
      st->bracketed = true;
      const double a =
          interp_quadratic(st->alpha_lo, st->f_lo, st->dg_lo, st->alpha_hi,
                           st->f_hi);
      set_trial(st, a, x_out);
      return kEvaluate;
    }
    if (dg >= 0.0) {
      // slope turned positive: bracket is [alpha, alpha_lo] reversed
      st->alpha_hi = st->alpha_lo;
      st->f_hi = st->f_lo;
      st->alpha_lo = st->alpha;
      st->f_lo = f;
      st->dg_lo = dg;
      st->bracketed = true;
      const double a =
          interp_quadratic(st->alpha_lo, st->f_lo, st->dg_lo, st->alpha_hi,
                           st->f_hi);
      set_trial(st, a, x_out);
      return kEvaluate;
    }
    // still descending: expand
    st->alpha_lo = st->alpha;
    st->f_lo = f;
    st->dg_lo = dg;
    set_trial(st, st->alpha * 2.0, x_out);
    return kEvaluate;
  }

  // zoom phase
  if (!armijo || f >= st->f_lo) {
    st->alpha_hi = st->alpha;
    st->f_hi = f;
  } else {
    if (dg * (st->alpha_hi - st->alpha_lo) >= 0.0) {
      st->alpha_hi = st->alpha_lo;
      st->f_hi = st->f_lo;
    }
    st->alpha_lo = st->alpha;
    st->f_lo = f;
    st->dg_lo = dg;
  }
  const double a = interp_quadratic(st->alpha_lo, st->f_lo, st->dg_lo,
                                    st->alpha_hi, st->f_hi);
  set_trial(st, a, x_out);
  return kEvaluate;
}

// accessors for tests / state introspection
double cglb_lbfgs_best_f(void* handle) {
  return static_cast<LbfgsState*>(handle)->f0;
}

void cglb_lbfgs_best_x(void* handle, double* out) {
  auto* st = static_cast<LbfgsState*>(handle);
  std::memcpy(out, st->x0.data(), sizeof(double) * st->n);
}

}  // extern "C"
