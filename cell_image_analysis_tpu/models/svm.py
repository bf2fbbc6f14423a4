"""One-class RBF SVM: TPU kernel matrix + host SMO fit, jitted inference.

Replaces `sklearn.svm.OneClassSVM(kernel='rbf', gamma='scale', nu=...)` at
its reference call sites: fit CAE_improved_modeltrain.py:421-427,
predict/decision_function improved_detection.py:138-142.

TPU-first split (SURVEY.md section 2.3):
- The O(N^2) training kernel matrix is a matmul-shaped computation —
  ||x-y||^2 = |x|^2 + |y|^2 - 2 x.y — done on device.
- The dual QP is solved host-side by SMO (models/smo.py; C++ when built),
  mirroring libsvm, because pairwise working-set updates are sequential.
- The decision function — the screening hot path — is a jitted kernel-matvec:
  f(x) = sum_i alpha_i exp(-gamma ||x - sv_i||^2) - rho, evaluated as one
  (B, K) kernel block followed by a matvec, both MXU-friendly; it composes
  into the end-to-end screening graph.

sklearn conventions preserved: gamma='scale' = 1/(n_features * X.var());
decision > 0 <=> inlier (+1), else anomaly (-1); the pipelines report the
*negated* decision so higher = more anomalous (improved_detection.py:149-150).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.utils import prec

from cell_image_analysis_tpu.models.smo import smo_one_class

_SV_TAU = 1e-10


class SVMParams(NamedTuple):
    """Jit-friendly parameter bundle for the decision function."""

    support_vectors: jax.Array  # (K, D) float32
    dual_coef: jax.Array        # (K,)  float32
    rho: jax.Array              # ()    float32
    gamma: jax.Array            # ()    float32


@jax.jit
def rbf_kernel(X: jax.Array, Y: jax.Array, gamma: jax.Array) -> jax.Array:
    """exp(-gamma ||x - y||^2) as |x|^2 + |y|^2 - 2 x.y (MXU matmul form)."""
    X = X.astype(jnp.float32)
    Y = Y.astype(jnp.float32)
    xx = jnp.sum(X * X, axis=1, keepdims=True)
    yy = jnp.sum(Y * Y, axis=1, keepdims=True)
    d2 = xx + yy.T - 2.0 * jnp.dot(X, Y.T, preferred_element_type=jnp.float32,
                                   precision=prec.highest("svm"))
    return jnp.exp(-gamma * jnp.maximum(d2, 0.0))


@jax.jit
def decision_function(params: SVMParams, X: jax.Array) -> jax.Array:
    """f(x) = sum_i alpha_i k(x, sv_i) - rho; positive = inlier."""
    K = rbf_kernel(X, params.support_vectors, params.gamma)
    return jnp.dot(K, params.dual_coef, preferred_element_type=jnp.float32,
                   precision=prec.highest("svm")) - params.rho


@dataclass
class OneClassSVM:
    nu: float = 0.5
    gamma: str | float = "scale"
    tol: float = 1e-3
    # fitted state
    gamma_: float | None = None
    support_vectors_: np.ndarray | None = None
    dual_coef_: np.ndarray | None = None
    intercept_: float | None = None  # = -rho (sklearn convention)
    n_iter_: int | None = None

    def _resolve_gamma(self, X: np.ndarray) -> float:
        if self.gamma == "scale":
            v = float(np.asarray(X, dtype=np.float64).var())
            return 1.0 / (X.shape[1] * v) if v > 0 else 1.0
        if self.gamma == "auto":
            return 1.0 / X.shape[1]
        return float(self.gamma)

    def fit(self, X) -> "OneClassSVM":
        X = np.asarray(X, dtype=np.float32)
        self.gamma_ = self._resolve_gamma(X)
        # kernel matrix on device, solver on host
        K = np.asarray(rbf_kernel(jnp.asarray(X), jnp.asarray(X), jnp.float32(self.gamma_)))
        alpha, rho, n_iter = smo_one_class(K, self.nu, tol=self.tol)
        sv = alpha > _SV_TAU
        self.support_vectors_ = X[sv]
        self.dual_coef_ = alpha[sv].astype(np.float32)
        self.intercept_ = -float(rho)
        self.n_iter_ = n_iter
        return self

    @property
    def params(self) -> SVMParams:
        return SVMParams(
            support_vectors=jnp.asarray(self.support_vectors_, dtype=jnp.float32),
            dual_coef=jnp.asarray(self.dual_coef_, dtype=jnp.float32),
            rho=jnp.float32(-self.intercept_),
            gamma=jnp.float32(self.gamma_),
        )

    def decision_function(self, X) -> np.ndarray:
        return np.asarray(decision_function(self.params, jnp.asarray(X)))

    def predict(self, X) -> np.ndarray:
        d = self.decision_function(X)
        return np.where(d > 0, 1, -1).astype(np.int32)
