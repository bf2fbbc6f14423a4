// One-class SVM dual solver (SMO with second-order working-set selection).
//
// Native counterpart of cell_image_analysis_tpu/models/smo.py — the
// framework's replacement for libsvm's C++ solver, which the reference uses
// through sklearn (CAE_improved_modeltrain.py:426-427).  The kernel matrix is
// computed on the TPU (models/svm.py); this solver runs the inherently
// sequential dual optimization on the host.  Loaded via ctypes
// (models/smo.py:_load_native); semantics match smo_one_class_np exactly.
//
// Problem:  min 1/2 a^T Q a   s.t. 0 <= a_i <= 1, sum a_i = nu * l.

#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {
constexpr double kTau = 1e-12;
}

extern "C" {

// Returns the iteration count.  K is row-major (l x l) and is NOT modified.
// alpha_out has length l; rho_out length 1.
int smo_one_class(const double* K, int l, double nu, double tol,
                  long max_iter, double* alpha_out, double* rho_out) {
  std::vector<double> alpha(l, 0.0);
  const double n = nu * static_cast<double>(l);
  const int nf = static_cast<int>(n);
  for (int i = 0; i < nf && i < l; ++i) alpha[i] = 1.0;
  if (nf < l) alpha[nf] = n - nf;

  // gradient G = K @ alpha
  std::vector<double> G(l, 0.0);
  for (int i = 0; i < l; ++i) {
    const double* Ki = K + static_cast<size_t>(i) * l;
    double a = alpha[i];
    if (a != 0.0) {
      for (int j = 0; j < l; ++j) G[j] += Ki[j] * a;
    }
  }

  long it = 0;
  for (; it < max_iter; ++it) {
    // i = argmin_{a_i < 1} G_i ;  stopping: max_{a>0} G - min_{a<1} G < tol
    int i = -1;
    double gmin = std::numeric_limits<double>::infinity();
    double gmax = -std::numeric_limits<double>::infinity();
    for (int t = 0; t < l; ++t) {
      if (alpha[t] < 1.0 - kTau && G[t] < gmin) { gmin = G[t]; i = t; }
      if (alpha[t] > kTau && G[t] > gmax) gmax = G[t];
    }
    if (i < 0 || gmax - gmin < tol) break;

    // second-order selection of j among {a_j > 0, G_j > G_i}
    const double* Ki = K + static_cast<size_t>(i) * l;
    const double Kii = Ki[i];
    int j = -1;
    double best = -std::numeric_limits<double>::infinity();
    for (int t = 0; t < l; ++t) {
      if (alpha[t] <= kTau) continue;
      const double diff = G[t] - gmin;  // = G_t - G_i
      if (diff <= 0) continue;
      double quad = Kii + K[static_cast<size_t>(t) * l + t] - 2.0 * Ki[t];
      if (quad <= 0) quad = kTau;
      const double gain = diff * diff / quad;
      if (gain > best) { best = gain; j = t; }
    }
    if (j < 0) break;

    const double* Kj = K + static_cast<size_t>(j) * l;
    double quad = Kii + Kj[j] - 2.0 * Ki[j];
    if (quad <= 0) quad = kTau;
    const double delta = (G[j] - G[i]) / quad;
    const double s = alpha[i] + alpha[j];
    double ai = alpha[i] + delta;
    const double lo = s > 1.0 ? s - 1.0 : 0.0;
    const double hi = s < 1.0 ? s : 1.0;
    if (ai < lo) ai = lo;
    if (ai > hi) ai = hi;
    const double aj = s - ai;
    const double dai = ai - alpha[i];
    const double daj = aj - alpha[j];
    if (std::fabs(dai) < kTau && std::fabs(daj) < kTau) break;
    alpha[i] = ai;
    alpha[j] = aj;
    for (int t = 0; t < l; ++t) G[t] += Ki[t] * dai + Kj[t] * daj;
  }

  // rho from free SVs (mean gradient), else midpoint of active bounds
  double sum = 0.0;
  int nfree = 0;
  double ub = std::numeric_limits<double>::infinity();
  double lb = -std::numeric_limits<double>::infinity();
  for (int t = 0; t < l; ++t) {
    const bool up = alpha[t] < 1.0 - kTau;
    const bool low = alpha[t] > kTau;
    if (up && low) { sum += G[t]; ++nfree; }
    if (up && G[t] < ub) ub = G[t];
    if (low && G[t] > lb) lb = G[t];
  }
  *rho_out = nfree > 0 ? sum / nfree : (ub + lb) / 2.0;
  for (int t = 0; t < l; ++t) alpha_out[t] = alpha[t];
  return static_cast<int>(it + 1);
}

}  // extern "C"
