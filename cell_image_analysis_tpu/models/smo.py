"""Host-side SMO solver for the one-class SVM dual problem.

The reference delegates one-class SVM training to libsvm's C++ SMO through
sklearn (CAE_improved_modeltrain.py:426-427).  Training is inherently
sequential (pairwise working-set updates), so per SURVEY.md section 2.3 it
stays host-side in this framework: the O(N^2 d) kernel matrix is computed on
the TPU (models/svm.py) and this module solves the dual on the host.  A C++
implementation (native/svm_smo.cpp, loaded via ctypes) is preferred when
built; this numpy version is the always-available fallback and the executable
specification for tests.

Problem (libsvm one-class form):
    min_alpha  1/2 alpha^T Q alpha
    s.t.       0 <= alpha_i <= 1,   sum_i alpha_i = nu * l
with Q_ij = k(x_i, x_j).  Working-set selection is libsvm's second-order
(WSS2) rule; rho is recovered from the free support vectors' gradients.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_TAU = 1e-12


def smo_one_class_np(
    K: np.ndarray, nu: float, tol: float = 1e-3, max_iter: int | None = None
) -> tuple[np.ndarray, float, int]:
    """Solve the one-class dual on a precomputed kernel matrix.

    Returns (alpha, rho, n_iter).
    """
    K = np.ascontiguousarray(K, dtype=np.float64)
    l = K.shape[0]
    n = nu * l
    alpha = np.zeros(l, dtype=np.float64)
    nf = int(n)
    alpha[:nf] = 1.0
    if nf < l:
        alpha[nf] = n - nf

    G = K @ alpha
    if max_iter is None:
        max_iter = max(10_000_000 // max(l, 1), 100 * l, 10_000)

    it = 0
    for it in range(max_iter):
        up = alpha < 1.0 - _TAU
        low = alpha > _TAU
        # libsvm optimality: m(a) = max_{I_up} -G, M(a) = min_{I_low} -G,
        # stop when m - M < tol  <=>  max_low G - min_up G < tol
        Gup = np.where(up, G, np.inf)
        i = int(np.argmin(Gup))
        m = -G[i]
        Glow = np.where(low, G, -np.inf)
        M = -np.max(Glow)
        if m - M < tol:
            break

        # WSS2: among I_low with -G_t < m, maximize (m + G_t)^2 / quad
        diff = m + G  # = -(-G) + G_t ... > 0 for violators
        quad = K[i, i] + np.diag(K) - 2.0 * K[i]
        quad = np.where(quad <= 0, _TAU, quad)
        gain = np.where(low & (diff > 0), (diff * diff) / quad, -np.inf)
        j = int(np.argmax(gain))
        if not np.isfinite(gain[j]):
            break

        delta = (G[j] - G[i]) / max(quad[j], _TAU)
        s = alpha[i] + alpha[j]
        ai = alpha[i] + delta
        ai = min(max(ai, max(0.0, s - 1.0)), min(1.0, s))
        aj = s - ai
        dai, daj = ai - alpha[i], aj - alpha[j]
        if abs(dai) < _TAU and abs(daj) < _TAU:
            break
        alpha[i], alpha[j] = ai, aj
        G += K[i] * dai + K[j] * daj

    # rho: average gradient over free SVs; midpoint of the active bounds if
    # no free SVs exist
    free = (alpha > _TAU) & (alpha < 1.0 - _TAU)
    if free.any():
        rho = float(G[free].mean())
    else:
        ub = float(np.min(np.where(alpha < 1.0 - _TAU, G, np.inf)))
        lb = float(np.max(np.where(alpha > _TAU, G, -np.inf)))
        rho = (ub + lb) / 2.0
    return alpha, rho, it + 1


_NATIVE_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "build",
    "libcia_native.so",
)
_native = None


def _load_native():
    global _native
    if _native is None and os.path.exists(_NATIVE_PATH):
        lib = ctypes.CDLL(_NATIVE_PATH)
        lib.smo_one_class.restype = ctypes.c_int
        lib.smo_one_class.argtypes = [
            ctypes.POINTER(ctypes.c_double),  # K (l*l)
            ctypes.c_int,                     # l
            ctypes.c_double,                  # nu
            ctypes.c_double,                  # tol
            ctypes.c_long,                    # max_iter
            ctypes.POINTER(ctypes.c_double),  # out alpha (l)
            ctypes.POINTER(ctypes.c_double),  # out rho (1)
        ]
        _native = lib
    return _native


def smo_one_class(
    K: np.ndarray, nu: float, tol: float = 1e-3, max_iter: int | None = None
) -> tuple[np.ndarray, float, int]:
    """Dispatch to the C++ solver when built, else the numpy reference."""
    lib = _load_native()
    if lib is None:
        return smo_one_class_np(K, nu, tol, max_iter)
    K64 = np.ascontiguousarray(K, dtype=np.float64)
    l = K64.shape[0]
    alpha = np.zeros(l, dtype=np.float64)
    rho = np.zeros(1, dtype=np.float64)
    if max_iter is None:
        max_iter = max(10_000_000 // max(l, 1), 100 * l, 10_000)
    iters = lib.smo_one_class(
        K64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int(l),
        ctypes.c_double(nu),
        ctypes.c_double(tol),
        ctypes.c_long(max_iter),
        alpha.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rho.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    return alpha, float(rho[0]), int(iters)
