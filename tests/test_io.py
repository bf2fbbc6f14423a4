"""Ingest stream + artifact store round-trips."""

import numpy as np
import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.io.artifacts import (
    build_scoring_params,
    load_cae,
    load_screening_artifacts,
    save_cae,
    save_training_artifacts,
)
from cell_image_analysis_tpu.io.ingest import FrameStream, list_tiffs, split_channels
from cell_image_analysis_tpu.io.tiff import imwrite
from cell_image_analysis_tpu.models.cae import forward, init_cae
from cell_image_analysis_tpu.models.ensemble import EnsembleDetector
from cell_image_analysis_tpu.models.pca import PCA
from cell_image_analysis_tpu.models.scaler import RobustScaler
from cell_image_analysis_tpu.models.svm import OneClassSVM
from cell_image_analysis_tpu.utils.synthetic import make_dataset


def test_split_channels_multichannel(rng):
    img = rng.integers(0, 1000, (32, 32, 3)).astype(np.uint16)
    seg, green = split_channels(img)
    np.testing.assert_array_equal(seg, img[..., 2])
    np.testing.assert_array_equal(green, img[..., 1])
    mono = img[..., 0]
    s2, g2 = split_channels(mono)
    assert s2 is mono and g2 is mono


def test_frame_stream_order_and_errors(tmp_path, rng):
    paths = make_dataset(str(tmp_path), n_frames=5, size=64, n_cells=2)
    bad = str(tmp_path / "frame_002a.tif")
    with open(bad, "w") as f:
        f.write("garbage")
    all_paths = list_tiffs(str(tmp_path))
    assert len(all_paths) == 6
    stream = FrameStream(all_paths, n_workers=3, prefetch=2)
    seen = [p for p, _, _ in stream]
    # order preserved, bad file skipped and logged
    assert seen == [p for p in all_paths if p != bad]
    assert len(stream.errors) == 1 and stream.errors[0][0] == bad


def test_cae_artifact_roundtrip(tmp_path, rng):
    model, variables = init_cae(jax.random.PRNGKey(0))
    p = str(tmp_path / "m.keras")
    save_cae(p, model, variables)
    model2, variables2 = load_cae(p)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 1)).astype(np.float32))
    r1, _ = forward(model, variables, x)
    r2, _ = forward(model2, variables2, x)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r2), atol=1e-7)


def test_full_artifact_contract_roundtrip(tmp_path, rng):
    model, variables = init_cae(jax.random.PRNGKey(0))
    feats = rng.normal(size=(100, 2048)).astype(np.float32)
    scaler = RobustScaler().fit(feats)
    pca = PCA(n_components=8).fit(feats)
    red = np.asarray(pca.transform(feats))
    dets = {"Conservative": OneClassSVM(nu=0.05).fit(red),
            "Moderate": OneClassSVM(nu=0.10).fit(red)}
    ens = EnsembleDetector(mse_threshold=0.5)
    save_training_artifacts(str(tmp_path), model, variables, variables, scaler, pca, dets, ens)
    m2, v2, s2, p2, d2, e2 = load_screening_artifacts(str(tmp_path))
    np.testing.assert_allclose(s2.center_, scaler.center_)
    np.testing.assert_allclose(p2.components_, pca.components_)
    np.testing.assert_allclose(
        d2["Conservative"].decision_function(red),
        dets["Conservative"].decision_function(red), atol=1e-6,
    )
    assert e2.mse_threshold == 0.5
    params = build_scoring_params(m2, v2, s2, p2, d2, e2)
    assert params.pca_components.shape == (8, 2048)
