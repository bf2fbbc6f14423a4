"""PCA on device — fit via SVD/eigendecomposition, transform as a matmul.

TPU-native replacement for `sklearn.decomposition.PCA` at
CAE_improved_modeltrain.py:412-414 (fit, n_components = min(100, n_features,
n_samples-1)) and improved_detection.py:135 (transform).  The transform is a
single (N, D) @ (D, K) matmul — pure MXU work — and composes into the jitted
screening graph.

Sign convention matches sklearn's `svd_flip` (v-based, the PCA fit path):
each component is flipped so its largest-|.| coefficient is positive, making
components_ comparable in tests.  Downstream results are flip-invariant
anyway: the RBF kernel depends only on distances, which any axis reflection
preserves.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.utils import prec


@dataclass
class PCA:
    n_components: int
    mean_: np.ndarray | None = None
    components_: np.ndarray | None = None            # (K, D)
    explained_variance_: np.ndarray | None = None
    explained_variance_ratio_: np.ndarray | None = None

    def fit(self, X) -> "PCA":
        X = jnp.asarray(X, dtype=jnp.float32)
        n, d = X.shape
        k = min(self.n_components, d, n - 1)
        mean, comps, ev, evr = _fit(X, k)
        self.mean_ = np.asarray(mean)
        self.components_ = np.asarray(comps)
        self.explained_variance_ = np.asarray(ev)
        self.explained_variance_ratio_ = np.asarray(evr)
        return self

    def transform(self, X) -> jax.Array:
        return transform(jnp.asarray(X), jnp.asarray(self.mean_), jnp.asarray(self.components_))

    def fit_transform(self, X) -> jax.Array:
        return self.fit(X).transform(X)


def _fit(X: jax.Array, k: int):
    # Fit-time SVD runs on the HOST in float64: XLA:TPU lowers linalg.svd to
    # a slow iterative routine (measured minutes for 256x2048 through this
    # environment's tunnel) and fit is a one-off; the hot path — transform —
    # stays a device matmul.
    Xh = np.asarray(X, dtype=np.float64)
    n = Xh.shape[0]
    mean = Xh.mean(axis=0)
    u, s, vt = np.linalg.svd(Xh - mean, full_matrices=False)
    # sklearn svd_flip (v-based, as used by PCA._fit_full since sklearn 1.5):
    # flip each component so its max-|.| coefficient is positive
    idx = np.argmax(np.abs(vt), axis=1)
    signs = np.sign(vt[np.arange(vt.shape[0]), idx])
    signs[signs == 0] = 1.0
    vt = vt * signs[:, None]
    var = (s ** 2) / (n - 1)
    total = var.sum()
    return (mean.astype(np.float32), vt[:k].astype(np.float32),
            var[:k].astype(np.float32), (var[:k] / total).astype(np.float32))


@jax.jit
def transform(X: jax.Array, mean: jax.Array, components: jax.Array) -> jax.Array:
    return jnp.dot(  # HIGHEST: TPU default is 1-pass bf16; this is tiny
        X.astype(jnp.float32) - mean, components.T,
        preferred_element_type=jnp.float32,
        precision=prec.highest("pca"),
    )
