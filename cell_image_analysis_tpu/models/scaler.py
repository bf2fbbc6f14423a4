"""RobustScaler — median/IQR feature standardization.

TPU-native replacement for `sklearn.preprocessing.RobustScaler` at
CAE_improved_modeltrain.py:408-409 (fit on encoder features) and
improved_detection.py:134 (transform at screening time).  sklearn semantics:
center = per-feature median, scale = per-feature (q75 - q25) with zero scales
replaced by 1; transform = (x - center) / scale.  Fit statistics are computed
with the jitted sort-based percentile kernel; transform is elementwise and
fuses into the surrounding jit graph.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.ops.percentile import median_iqr


@dataclass
class RobustScaler:
    center_: np.ndarray | None = None
    scale_: np.ndarray | None = None

    def fit(self, X) -> "RobustScaler":
        med, iqr = median_iqr(jnp.asarray(X, dtype=jnp.float32))
        iqr = jnp.where(iqr == 0.0, 1.0, iqr)  # sklearn _handle_zeros_in_scale
        self.center_ = np.asarray(med)
        self.scale_ = np.asarray(iqr)
        return self

    def transform(self, X) -> jax.Array:
        return transform(jnp.asarray(X), jnp.asarray(self.center_), jnp.asarray(self.scale_))

    def fit_transform(self, X) -> jax.Array:
        return self.fit(X).transform(X)


@jax.jit
def transform(X: jax.Array, center: jax.Array, scale: jax.Array) -> jax.Array:
    return (X.astype(jnp.float32) - center) / scale
