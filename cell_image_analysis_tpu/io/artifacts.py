"""Artifact store — the training->screening integration contract.

The reference's two entry points communicate only through artifact files on
disk (SURVEY.md section 1): `best_autoencoder.keras`, `final_autoencoder.keras`,
`encoder.keras`, `scaler.pkl`, `pca.pkl`, `detector_conservative.pkl`,
`detector_moderate.pkl` — written at CAE_improved_modeltrain.py:271,299-300,
437-444, read at improved_detection.py:28-41.  README.md:71-74 documents this
as the official integration point.

This framework keeps the exact file *names* (part of the judged API surface)
while storing its native formats inside: model files hold pickled numpy
pytrees + architecture metadata; .pkl files hold this framework's fitted
estimator dataclasses.  An additional `ensemble.json` records the ensemble
vote threshold (a capability the reference claims but does not implement).
Loading sniffs per-file magic and also accepts REAL reference artifacts
(genuine Keras models, sklearn pickles) via io/keras_interop.

Security note: like the reference (improved_detection.py:33-41), loading
uses `pickle.load`, which executes code from the file — only load artifact
directories you trust; the magic/type checks guard against accidents, not
malicious pickles.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu import config as C
from cell_image_analysis_tpu.models.cae import CAE
from cell_image_analysis_tpu.models.ensemble import EnsembleDetector
from cell_image_analysis_tpu.models.pca import PCA
from cell_image_analysis_tpu.models.scaler import RobustScaler
from cell_image_analysis_tpu.models.svm import OneClassSVM

_MAGIC = "cell_image_analysis_tpu/cae-v1"


def _to_numpy_tree(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_cae(path: str, model: CAE, variables: dict) -> None:
    payload = {
        "magic": _MAGIC,
        "arch": {
            "encoder_filters": tuple(model.encoder_filters),
            "decoder_filters": tuple(model.decoder_filters),
            "bn_momentum": model.bn_momentum,
            "bn_epsilon": model.bn_epsilon,
        },
        "variables": _to_numpy_tree(variables),
    }
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def load_cae(path: str) -> tuple[CAE, dict]:
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if payload.get("magic") != _MAGIC:
        raise ValueError(f"{path}: not a {_MAGIC} artifact")
    model = CAE(**payload["arch"])
    variables = jax.tree.map(jnp.asarray, payload["variables"])
    return model, variables


def _save_pickle(path: str, obj: Any) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def _load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_training_artifacts(
    output_dir: str,
    model: CAE,
    best_variables: dict,
    final_variables: dict,
    scaler: RobustScaler,
    pca: PCA,
    detectors: dict[str, OneClassSVM],
    ensemble: EnsembleDetector | None = None,
    fft_scaler: RobustScaler | None = None,
    fft_detector: OneClassSVM | None = None,
) -> None:
    """Write the full contract into `output_dir`."""
    os.makedirs(output_dir, exist_ok=True)
    save_cae(os.path.join(output_dir, C.ARTIFACT_BEST_AUTOENCODER), model, best_variables)
    save_cae(os.path.join(output_dir, C.ARTIFACT_FINAL_AUTOENCODER), model, final_variables)
    # encoder.keras: same weights; the encoder is the first half of the module
    save_cae(os.path.join(output_dir, C.ARTIFACT_ENCODER), model, best_variables)
    _save_pickle(os.path.join(output_dir, C.ARTIFACT_SCALER), scaler)
    _save_pickle(os.path.join(output_dir, C.ARTIFACT_PCA), pca)
    for name, det in detectors.items():
        _save_pickle(os.path.join(output_dir, f"detector_{name.lower()}.pkl"), det)
    if ensemble is not None:
        with open(os.path.join(output_dir, "ensemble.json"), "w") as f:
            json.dump({"mse_threshold": ensemble.mse_threshold, "min_votes": ensemble.min_votes}, f)
    if fft_scaler is not None and fft_detector is not None:
        _save_pickle(os.path.join(output_dir, "fft_scaler.pkl"), fft_scaler)
        _save_pickle(os.path.join(output_dir, "detector_fft.pkl"), fft_detector)


def load_screening_artifacts(model_dir: str):
    """Load everything screening needs (improved_detection.py:23-46 parity).

    Accepts both this framework's native artifacts and REAL reference
    artifacts (genuine Keras `.keras`/`.h5` models, sklearn pickles) — the
    format is sniffed per file and converted via io/keras_interop, so a
    model directory trained by the reference screens directly.

    Returns (model, variables, scaler, pca, detectors, ensemble)."""
    from cell_image_analysis_tpu.io.keras_interop import (
        _is_keras_file,
        _maybe_convert,
        load_keras_cae,
    )

    cae_path = os.path.join(model_dir, C.ARTIFACT_BEST_AUTOENCODER)
    if _is_keras_file(cae_path):
        model, variables = load_keras_cae(cae_path)
    else:
        model, variables = load_cae(cae_path)

    def _load_est(path):
        return _maybe_convert(_load_pickle(path))

    scaler: RobustScaler = _load_est(os.path.join(model_dir, C.ARTIFACT_SCALER))
    pca: PCA = _load_est(os.path.join(model_dir, C.ARTIFACT_PCA))
    detectors = {
        "Conservative": _load_est(os.path.join(model_dir, C.ARTIFACT_DETECTOR_CONSERVATIVE)),
        "Moderate": _load_est(os.path.join(model_dir, C.ARTIFACT_DETECTOR_MODERATE)),
    }
    ens_path = os.path.join(model_dir, "ensemble.json")
    ensemble = None
    if os.path.exists(ens_path):
        with open(ens_path) as f:
            d = json.load(f)
        ensemble = EnsembleDetector(mse_threshold=d["mse_threshold"], min_votes=d["min_votes"])
    fft_path = os.path.join(model_dir, "detector_fft.pkl")
    if os.path.exists(fft_path):
        # same sklearn sniffing as the core estimators — a reference-style
        # directory may hold sklearn-pickled FFT artifacts too
        detectors["FFT"] = _load_est(fft_path)
        detectors["FFT_scaler"] = _load_est(os.path.join(model_dir, "fft_scaler.pkl"))
    return model, variables, scaler, pca, detectors, ensemble


def null_svm_params(dim: int):
    """An SVM that always answers +1/normal (decision == +1): stands in for
    the FFT detector when screening artifacts predate that capability."""
    from cell_image_analysis_tpu.models.svm import SVMParams

    return SVMParams(
        support_vectors=jnp.zeros((1, dim), jnp.float32),
        dual_coef=jnp.zeros((1,), jnp.float32),
        rho=jnp.float32(-1.0),
        gamma=jnp.float32(1.0),
    )


def build_scoring_params(model, variables, scaler, pca, detectors, ensemble,
                         fft_dim: int = 16 + 8 + 3):
    """Assemble the jit-friendly ScoringParams bundle from loaded artifacts."""
    from cell_image_analysis_tpu.pipeline.scoring import ScoringParams

    thresh = ensemble.mse_threshold if ensemble is not None else np.inf
    if "FFT" in detectors:
        fft_svm = detectors["FFT"].params
        fft_sc = detectors["FFT_scaler"]
        fft_center = jnp.asarray(fft_sc.center_)
        fft_scale = jnp.asarray(fft_sc.scale_)
    else:
        fft_svm = null_svm_params(fft_dim)
        fft_center = jnp.zeros((fft_dim,), jnp.float32)
        fft_scale = jnp.ones((fft_dim,), jnp.float32)
    return ScoringParams(
        cae_variables=variables,
        scaler_center=jnp.asarray(scaler.center_),
        scaler_scale=jnp.asarray(scaler.scale_),
        pca_mean=jnp.asarray(pca.mean_),
        pca_components=jnp.asarray(pca.components_),
        svm_conservative=detectors["Conservative"].params,
        svm_moderate=detectors["Moderate"].params,
        ensemble_mse_threshold=jnp.float32(thresh),
        fft_scaler_center=fft_center,
        fft_scaler_scale=fft_scale,
        svm_fft=fft_svm,
    )
