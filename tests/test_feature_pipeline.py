"""RobustScaler / PCA / OneClassSVM vs their sklearn counterparts."""

import numpy as np
import sklearn.decomposition
import sklearn.preprocessing
import sklearn.svm

from cell_image_analysis_tpu.models.pca import PCA
from cell_image_analysis_tpu.models.scaler import RobustScaler
from cell_image_analysis_tpu.models.smo import smo_one_class_np
from cell_image_analysis_tpu.models.svm import OneClassSVM


def test_robust_scaler_matches_sklearn(rng):
    X = rng.normal(size=(501, 64)).astype(np.float32) * 10 + 3
    X[:, 7] = 5.0  # constant feature -> zero IQR -> scale 1
    ours = RobustScaler().fit(X)
    ref = sklearn.preprocessing.RobustScaler().fit(X)
    np.testing.assert_allclose(ours.center_, ref.center_, atol=1e-4)
    np.testing.assert_allclose(ours.scale_, ref.scale_, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(ours.transform(X)), ref.transform(X), atol=1e-4
    )


def test_pca_matches_sklearn(rng):
    X = rng.normal(size=(300, 128)).astype(np.float32)
    # well-separated spectrum so component directions are numerically stable
    X[:, :32] *= np.linspace(40.0, 4.0, 32, dtype=np.float32)
    ours = PCA(n_components=32).fit(X)
    ref = sklearn.decomposition.PCA(n_components=32).fit(X.astype(np.float64))
    np.testing.assert_allclose(ours.mean_, ref.mean_, atol=1e-4)
    np.testing.assert_allclose(
        ours.explained_variance_ratio_, ref.explained_variance_ratio_, atol=1e-4
    )
    # components match up to float tolerance (signs aligned via svd_flip)
    np.testing.assert_allclose(ours.components_, ref.components_, atol=5e-3)
    np.testing.assert_allclose(
        np.asarray(ours.transform(X)), ref.transform(X.astype(np.float64)), atol=5e-3
    )


def test_pca_component_cap(rng):
    X = rng.normal(size=(50, 128)).astype(np.float32)
    p = PCA(n_components=100).fit(X)
    assert p.components_.shape == (49, 128)  # min(100, 128, N-1)


def test_smo_matches_sklearn_decision(rng):
    X = rng.normal(size=(400, 12)).astype(np.float64)
    X[::7] += 3.0  # some outliers
    for nu in (0.05, 0.10, 0.5):
        ref = sklearn.svm.OneClassSVM(kernel="rbf", gamma="scale", nu=nu).fit(X)
        ours = OneClassSVM(nu=nu, gamma="scale").fit(X)
        assert abs(ours.gamma_ - ref._gamma) < 1e-9
        d_ref = ref.decision_function(X)
        d_ours = ours.decision_function(X)
        np.testing.assert_allclose(d_ours, d_ref, atol=2e-3)
        # predictions agree except possibly at the decision boundary
        disagree = (ours.predict(X) != ref.predict(X)).mean()
        assert disagree < 0.01, f"nu={nu}: {disagree:.3f} disagreement"


def test_smo_anomaly_rate_approximates_nu(rng):
    X = rng.normal(size=(1000, 8)).astype(np.float64)
    for nu in (0.05, 0.10):
        ours = OneClassSVM(nu=nu).fit(X)
        rate = (ours.predict(X) == -1).mean()
        assert abs(rate - nu) < 0.03, (nu, rate)


def test_smo_respects_constraints(rng):
    X = rng.normal(size=(200, 5))
    gamma = 0.2
    d2 = ((X[:, None] - X[None, :]) ** 2).sum(-1)
    K = np.exp(-gamma * d2)
    nu = 0.1
    alpha, rho, _ = smo_one_class_np(K, nu)
    assert np.all(alpha >= -1e-9) and np.all(alpha <= 1 + 1e-9)
    assert abs(alpha.sum() - nu * len(X)) < 1e-6
