"""Explicit ensemble anomaly combiner.

README.md:59 claims "reconstruction error, encoder features, SVM, and
ensemble methods", but the reference computes recon-error + SVM only and has
no combiner (SURVEY.md section 2.2.7).  Per the survey mandate this framework
provides the ensemble explicitly: a majority vote over

  1. reconstruction-MSE above the training set's 95th percentile
     (EnsembleConfig.mse_percentile),
  2. the Conservative one-class SVM flag (nu=0.05),
  3. the Moderate one-class SVM flag (nu=0.10),

with `min_votes` (default 2) votes required to call a cell anomalous.  The
vote is pure elementwise arithmetic and fuses into the jitted scoring graph.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.config import EnsembleConfig


@dataclass
class EnsembleDetector:
    """Fitted state: the recon-error vote threshold from training data."""

    mse_threshold: float
    min_votes: int = 2

    @classmethod
    def fit(cls, train_mse: np.ndarray, cfg: EnsembleConfig = EnsembleConfig()) -> "EnsembleDetector":
        return cls(
            mse_threshold=float(np.percentile(np.asarray(train_mse), cfg.mse_percentile)),
            min_votes=cfg.min_votes,
        )

    def predict(self, mse, cons_pred, mod_pred) -> np.ndarray:
        """Returns +1 (normal) / -1 (anomaly), sklearn-style."""
        return np.asarray(
            ensemble_predict(
                jnp.asarray(mse), jnp.asarray(cons_pred), jnp.asarray(mod_pred),
                jnp.float32(self.mse_threshold), self.min_votes,
            )
        )


@jax.jit
def ensemble_votes(mse, cons_pred, mod_pred, mse_threshold):
    v1 = (mse > mse_threshold).astype(jnp.int32)
    v2 = (cons_pred == -1).astype(jnp.int32)
    v3 = (mod_pred == -1).astype(jnp.int32)
    return v1 + v2 + v3


def ensemble_predict(mse, cons_pred, mod_pred, mse_threshold, min_votes: int = 2):
    votes = ensemble_votes(mse, cons_pred, mod_pred, mse_threshold)
    return jnp.where(votes >= min_votes, -1, 1).astype(jnp.int32)
