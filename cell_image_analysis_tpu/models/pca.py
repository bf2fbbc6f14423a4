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
    n = X.shape[0]
    mean = jnp.mean(X, axis=0)
    Xc = X - mean
    # full SVD of the centered data; N and D here (<=~50k x 2048) are well
    # within one chip's HBM
    u, s, vt = jnp.linalg.svd(Xc, full_matrices=False)
    # sklearn svd_flip (v-based, as used by PCA._fit_full since sklearn 1.5):
    # flip each component so its max-|.| coefficient is positive
    idx = jnp.argmax(jnp.abs(vt), axis=1)
    signs = jnp.sign(vt[jnp.arange(vt.shape[0]), idx])
    signs = jnp.where(signs == 0, 1.0, signs)
    vt = vt * signs[:, None]
    var = (s ** 2) / (n - 1)
    total = jnp.sum(var)
    return mean, vt[:k], var[:k], var[:k] / total


@jax.jit
def transform(X: jax.Array, mean: jax.Array, components: jax.Array) -> jax.Array:
    return jnp.dot(
        X.astype(jnp.float32) - mean, components.T, preferred_element_type=jnp.float32
    )
