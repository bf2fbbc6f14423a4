"""FFT features, ensemble combiner, and the fused scoring graph."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.models.cae import init_cae
from cell_image_analysis_tpu.models.ensemble import EnsembleDetector
from cell_image_analysis_tpu.models.pca import PCA
from cell_image_analysis_tpu.models.scaler import RobustScaler
from cell_image_analysis_tpu.models.svm import OneClassSVM
from cell_image_analysis_tpu.ops.fft_features import fft_features
from cell_image_analysis_tpu.pipeline.scoring import (
    ScoringParams,
    compute_anomaly_scores,
    score_cells,
)


def test_fft_features_shape_and_normalization(rng):
    x = rng.uniform(size=(5, 64, 64)).astype(np.float32)
    f = np.asarray(fft_features(jnp.asarray(x)))
    assert f.shape == (5, 16 + 8 + 3)
    np.testing.assert_allclose(f[:, :16].sum(axis=1), 1.0, atol=1e-4)   # radial
    np.testing.assert_allclose(f[:, 16:24].sum(axis=1), 1.0, atol=1e-4)  # angular


def test_fft_features_discriminate_frequency_content(rng):
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    low = np.sin(2 * np.pi * 2 * xx / 64)   # 2 cycles
    high = np.sin(2 * np.pi * 24 * xx / 64)  # 24 cycles
    f = np.asarray(fft_features(jnp.asarray(np.stack([low, high]))))
    centroid_low, centroid_high = f[0, 24], f[1, 24]
    assert centroid_high > centroid_low + 0.3
    assert f[1, 25] > f[0, 25] + 0.5  # high-freq fraction


def test_fft_features_orientation(rng):
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    horiz = np.sin(2 * np.pi * 8 * xx / 64)  # variation along x
    vert = np.sin(2 * np.pi * 8 * yy / 64)
    f = np.asarray(fft_features(jnp.asarray(np.stack([horiz, vert]))))
    # the two gratings concentrate energy in different angular sectors
    assert np.argmax(f[0, 16:24]) != np.argmax(f[1, 16:24])


def test_ensemble_majority_vote(rng):
    mse = np.array([0.1, 0.9, 0.9, 0.1])
    cons = np.array([1, -1, 1, 1])
    mod = np.array([1, -1, -1, -1])
    det = EnsembleDetector(mse_threshold=0.5, min_votes=2)
    pred = det.predict(mse, cons, mod)
    # votes: 0, 3, 2, 1 -> normal, anomaly, anomaly, normal
    np.testing.assert_array_equal(pred, [1, -1, -1, 1])


def _fitted_params(rng, n_train=300):
    model, variables = init_cae(jax.random.PRNGKey(0))
    X = rng.uniform(size=(n_train, 64, 64, 1)).astype(np.float32)
    from cell_image_analysis_tpu.models.cae import encode, reconstruction_errors

    feats = np.asarray(encode(model, variables, jnp.asarray(X)))
    scaler = RobustScaler().fit(feats)
    pca = PCA(n_components=32).fit(np.asarray(scaler.transform(feats)))
    reduced = np.asarray(pca.transform(np.asarray(scaler.transform(feats))))
    cons = OneClassSVM(nu=0.05).fit(reduced)
    mod = OneClassSVM(nu=0.10).fit(reduced)
    mse, _ = reconstruction_errors(model, variables, jnp.asarray(X))
    ens = EnsembleDetector.fit(np.asarray(mse))
    from cell_image_analysis_tpu.io.artifacts import build_scoring_params
    from cell_image_analysis_tpu.ops.fft_features import fft_features

    fft = np.asarray(fft_features(jnp.asarray(X)))
    fft_scaler = RobustScaler().fit(fft)
    fft_det = OneClassSVM(nu=0.10).fit(np.asarray(fft_scaler.transform(fft)))
    params = build_scoring_params(
        model, variables, scaler, pca,
        {"Conservative": cons, "Moderate": mod, "FFT": fft_det, "FFT_scaler": fft_scaler},
        ens,
    )
    return model, params, (scaler, pca, cons, mod), X


@pytest.mark.slow
def test_score_cells_matches_stagewise_pipeline(rng):
    model, params, (scaler, pca, cons, mod), X = _fitted_params(rng)
    scores = compute_anomaly_scores(model, params, X[:64])
    # stage-by-stage recomputation must agree with the fused graph
    from cell_image_analysis_tpu.models.cae import encode, reconstruction_errors

    mse, mae = reconstruction_errors(model, params.cae_variables, jnp.asarray(X[:64]))
    np.testing.assert_allclose(scores["reconstruction_mse"], np.asarray(mse), atol=1e-6)
    feats = np.asarray(encode(model, params.cae_variables, jnp.asarray(X[:64])))
    reduced = np.asarray(pca.transform(np.asarray(scaler.transform(feats))))
    np.testing.assert_allclose(
        scores["conservative_scores"], -cons.decision_function(reduced), atol=1e-4
    )
    np.testing.assert_array_equal(scores["conservative_predictions"], cons.predict(reduced))
    assert 0.0 <= scores["conservative_anomaly_rate"] <= 1.0


@pytest.mark.slow
def test_training_set_rates_approximate_nu(rng):
    model, params, _, X = _fitted_params(rng, n_train=500)
    scores = compute_anomaly_scores(model, params, X)
    # the ~nu property is loose on heavily structured features (sklearn
    # produces the identical rates on this data; see test_feature_pipeline
    # for the tight sklearn-parity check)
    assert abs(scores["conservative_anomaly_rate"] - 0.05) < 0.05
    assert abs(scores["moderate_anomaly_rate"] - 0.10) < 0.05
    # ensemble (majority of 3, one being the 5% mse vote) sits between
    assert scores["ensemble_anomaly_rate"] <= scores["moderate_anomaly_rate"] + 0.02


def test_score_cells_masked_rates(rng):
    model, params, _, X = _fitted_params(rng, n_train=150)
    valid = np.ones(64, bool)
    valid[50:] = False
    scores = compute_anomaly_scores(model, params, X[:64], valid=valid)
    assert len(scores["reconstruction_mse"]) == 50
