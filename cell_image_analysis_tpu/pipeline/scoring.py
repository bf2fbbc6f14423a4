"""The fused anomaly-scoring graph — `compute_anomaly_scores` TPU-native.

Reference: improved_detection.py:117-153.  The reference runs five separate
library calls per batch (autoencoder.predict, encoder.predict,
scaler.transform, pca.transform, 2x SVM predict/decision); here the whole
chain — CAE forward, per-cell MSE/MAE, encoder features, RobustScaler, PCA
matmul, both RBF-SVM decision functions, 2D-FFT spectral features, and the
ensemble vote — is ONE jitted graph.  XLA fuses the elementwise stages into
the matmuls and the batch dimension shards over the 'data' mesh axis for
multi-chip screening with psum-reduced rates.

Output conventions match the reference exactly:
- `*_predictions` in {+1, -1} with -1 = anomaly;
- `*_scores` = negated SVM decision_function, higher = more anomalous
  (improved_detection.py:149-150);
- `*_anomaly_rate` = fraction(pred == -1) (improved_detection.py:151-152).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.cae import CAE
from cell_image_analysis_tpu.models.svm import SVMParams, decision_function
from cell_image_analysis_tpu.ops.fft_features import fft_features


class ScoringParams(NamedTuple):
    """Everything screening needs, as one jit-friendly pytree (built from the
    artifact store's six-file contract)."""

    cae_variables: dict          # {'params', 'batch_stats'}
    scaler_center: jax.Array     # (2048,)
    scaler_scale: jax.Array      # (2048,)
    pca_mean: jax.Array          # (2048,)
    pca_components: jax.Array    # (K, 2048)
    svm_conservative: SVMParams
    svm_moderate: SVMParams
    ensemble_mse_threshold: jax.Array  # ()


class CellScores(NamedTuple):
    reconstruction_mse: jax.Array        # (B,)
    reconstruction_mae: jax.Array        # (B,)
    conservative_predictions: jax.Array  # (B,) int32 {+1,-1}
    moderate_predictions: jax.Array
    conservative_scores: jax.Array       # (B,) negated decision fn
    moderate_scores: jax.Array
    ensemble_predictions: jax.Array      # (B,) int32 {+1,-1}
    fft: jax.Array                       # (B, F)


@partial(jax.jit, static_argnames=("model", "min_votes"))
def score_cells(model: CAE, params: ScoringParams, X: jax.Array, min_votes: int = 2) -> CellScores:
    """Score a (B, 64, 64, 1) batch of preprocessed cells."""
    X = X.astype(jnp.float32)
    recon, encoded = model.apply(params.cae_variables, X, train=False)
    diff = X - recon
    mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    mae = jnp.mean(jnp.abs(diff), axis=(1, 2, 3))

    feats = encoded.reshape(encoded.shape[0], -1)
    scaled = (feats - params.scaler_center) / params.scaler_scale
    reduced = jnp.dot(
        scaled - params.pca_mean,
        params.pca_components.T,
        preferred_element_type=jnp.float32,
    )

    d_cons = decision_function(params.svm_conservative, reduced)
    d_mod = decision_function(params.svm_moderate, reduced)
    p_cons = jnp.where(d_cons > 0, 1, -1).astype(jnp.int32)
    p_mod = jnp.where(d_mod > 0, 1, -1).astype(jnp.int32)

    votes = (
        (mse > params.ensemble_mse_threshold).astype(jnp.int32)
        + (p_cons == -1).astype(jnp.int32)
        + (p_mod == -1).astype(jnp.int32)
    )
    p_ens = jnp.where(votes >= min_votes, -1, 1).astype(jnp.int32)

    return CellScores(
        reconstruction_mse=mse,
        reconstruction_mae=mae,
        conservative_predictions=p_cons,
        moderate_predictions=p_mod,
        conservative_scores=-d_cons,
        moderate_scores=-d_mod,
        ensemble_predictions=p_ens,
        fft=fft_features(X),
    )


def compute_anomaly_scores(model: CAE, params: ScoringParams, cells, valid=None) -> dict:
    """Host-facing wrapper with the reference's dict schema
    (improved_detection.py:144-153), plus ensemble + FFT extensions.

    `valid` optionally masks capacity padding; rates are computed over valid
    entries only."""
    X = jnp.asarray(np.asarray(cells, dtype=np.float32))
    if X.ndim == 3:
        X = X[..., None]
    if X.shape[0] == 0:
        return {}
    s = score_cells(model, params, X)
    if valid is None:
        v = np.ones(X.shape[0], bool)
    else:
        v = np.asarray(valid, bool)
    n = max(int(v.sum()), 1)

    def rate(pred):
        return float(np.sum((np.asarray(pred) == -1) & v) / n)

    out = {
        "reconstruction_mse": np.asarray(s.reconstruction_mse)[v],
        "reconstruction_mae": np.asarray(s.reconstruction_mae)[v],
        "conservative_predictions": np.asarray(s.conservative_predictions)[v],
        "moderate_predictions": np.asarray(s.moderate_predictions)[v],
        "conservative_scores": np.asarray(s.conservative_scores)[v],
        "moderate_scores": np.asarray(s.moderate_scores)[v],
        "ensemble_predictions": np.asarray(s.ensemble_predictions)[v],
        "fft_features": np.asarray(s.fft)[v],
        "conservative_anomaly_rate": rate(s.conservative_predictions),
        "moderate_anomaly_rate": rate(s.moderate_predictions),
        "ensemble_anomaly_rate": rate(s.ensemble_predictions),
    }
    return out
