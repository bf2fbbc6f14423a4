"""End-to-end parity measurement: device pipeline vs the CPU reference stack.

The north-star correctness metric (BASELINE.md): max |anomaly-rate deviation|
< 1e-3 between this framework's fused device pipeline and the CPU reference
implementation of the same algorithms.  The oracle path here mirrors the
reference's stack (improved_detection.py:48-153) library-for-library:

- segmentation: scipy percentile-threshold oracle (threshold backend),
- regionprops + QC: ops/oracle/regionprops_np,
- CLAHE: ops/oracle/clahe_np; resize: scipy gaussian + zoom,
- CAE forward: REAL Keras on CPU via io/keras_interop export (the
  reference's TF stack) when available, else the flax forward,
- scaler/PCA/SVM decisions: float64 numpy (libsvm's decision function is
  the same closed form sum_i alpha_i K(x, sv_i) - rho),
- FFT features: float64 numpy mirror of ops/fft_features,
- ensemble vote: same >=min_votes rule.

Rates are fractions over identical cell sets, so <1e-3 deviation means the
two paths flag the SAME cells — float noise between XLA and numpy/TF only
flips a prediction for a cell sitting within that noise of a decision
boundary, which generic data does not produce.
"""

from __future__ import annotations

import numpy as np


def oracle_extract_cells(frame: np.ndarray, segment=None) -> np.ndarray:
    """Reference-stack oracle extraction for one (H, W, 3) frame:
    normalize -> segment -> QC -> CLAHE -> resize.  `segment` maps the
    percentile-normalized seg channel to an int label map; default is the
    scipy threshold backend.  Returns (N, 64, 64) float32 cells (reference
    extract_quality_cells, CAE_improved_modeltrain.py:39-111)."""
    from scipy import ndimage as ndi

    from cell_image_analysis_tpu.ops.oracle.clahe_np import equalize_adapthist_np
    from cell_image_analysis_tpu.ops.oracle.regionprops_np import regionprops_np

    seg = frame[..., 2].astype(np.float64)
    green = frame[..., 1].astype(np.float64)
    lo, hi = np.percentile(seg, 3), np.percentile(seg, 99.8)
    norm = (seg - lo) / (hi - lo + 1e-20)
    if segment is not None:
        labels = segment(norm)
    else:
        thresh = np.percentile(norm, 90.0)
        mask = ndi.binary_opening(norm > thresh)
        labels, _ = ndi.label(mask)
    h, w = labels.shape

    def resize_oracle(img, out=64):
        factors = np.array([img.shape[0] / out, img.shape[1] / out])
        sigma = np.maximum(0.0, (factors - 1.0) / 2.0)
        x = img.astype(np.float64)
        if np.any(sigma > 0):
            x = ndi.gaussian_filter(x, sigma, mode="mirror")
        return ndi.zoom(x, (out / img.shape[0], out / img.shape[1]), order=1,
                        mode="mirror", grid_mode=True)

    cells = []
    for p in regionprops_np(labels, green):
        minr, minc, maxr, maxc = p["bbox"]
        if minr < 10 or minc < 10 or maxr > h - 10 or maxc > w - 10:
            continue
        if p["area"] < 200 or p["area"] > 8000 or p["eccentricity"] > 0.95:
            continue
        crop = green[minr:maxr, minc:maxc]
        if crop.mean() < 0.5 or crop.std() < 0.1:
            continue
        cells.append(resize_oracle(equalize_adapthist_np(crop)))
    if not cells:
        return np.zeros((0, 64, 64), np.float32)
    return np.stack(cells).astype(np.float32)


def fft_features_np(cells: np.ndarray, radial_bins=16, angular_bins=8) -> np.ndarray:
    """float64 numpy mirror of ops/fft_features.fft_features."""
    b, h, w = cells.shape
    x = cells.astype(np.float64)
    F = np.fft.fftshift(np.fft.fft2(x), axes=(-2, -1))
    power = np.abs(F) ** 2
    cy, cx = h // 2, w // 2
    yy = (np.arange(h) - cy)[:, None].astype(np.float64)
    xx = (np.arange(w) - cx)[None, :].astype(np.float64)
    r = np.sqrt(yy * yy + xx * xx)
    r_norm = r / (min(h, w) / 2.0)
    theta = np.arctan2(yy, xx) % np.pi
    ac = np.where((r == 0.0)[None], 0.0, power)
    total = np.maximum(ac.sum(axis=(-2, -1)), 1e-20)
    r_bin = np.clip((r_norm * radial_bins).astype(np.int64), 0, radial_bins - 1)
    radial = np.stack([
        np.where(r_bin[None] == k, ac, 0.0).sum(axis=(-2, -1)) for k in range(radial_bins)
    ], axis=1) / total[:, None]
    a_bin = np.clip((theta / np.pi * angular_bins).astype(np.int64), 0, angular_bins - 1)
    angular = np.stack([
        np.where(a_bin[None] == k, ac, 0.0).sum(axis=(-2, -1)) for k in range(angular_bins)
    ], axis=1) / total[:, None]
    centroid = (ac * r_norm[None]).sum(axis=(-2, -1)) / total
    high = np.where(r_norm[None] > 0.5, ac, 0.0).sum(axis=(-2, -1)) / total
    tp = np.log10(total)
    return np.concatenate([radial, angular, centroid[:, None], high[:, None],
                           tp[:, None]], axis=1)


def _svm_decision_np(svm, X64: np.ndarray) -> np.ndarray:
    sv = np.asarray(svm.support_vectors_, np.float64)
    alpha = np.asarray(svm.dual_coef_, np.float64).reshape(-1)
    gamma = float(svm.gamma_)
    d2 = ((X64[:, None, :] - sv[None, :, :]) ** 2).sum(-1)
    return np.exp(-gamma * d2) @ alpha + float(svm.intercept_)


def oracle_score(cells: np.ndarray, host: dict, min_votes: int = 2,
                 use_keras: bool = True) -> dict:
    """Reference-stack scoring of (N, 64, 64) cells with the fitted host
    estimators from utils/bench._fit_params (improved_detection.py:117-153
    conventions).  Returns predictions and rates per detector."""
    X = cells[..., None].astype(np.float32)
    recon = enc = None
    if use_keras:
        try:
            from cell_image_analysis_tpu.io.keras_interop import (
                build_keras_cae,
                export_keras_cae,
            )
            import tempfile, os

            from cell_image_analysis_tpu.io.keras_interop import _require_keras

            keras = _require_keras()
            with tempfile.TemporaryDirectory() as d:
                path = os.path.join(d, "cae.keras")
                export_keras_cae(host["model"], host["variables"], path)
                km = keras.models.load_model(path, compile=False)
            recon = np.asarray(km.predict(X, verbose=0))
            # encoder = first half: rebuild twin encoder over same weights
            auto_t, enc_t = build_keras_cae()
            auto_t.set_weights(km.get_weights())
            enc = np.asarray(enc_t.predict(X, verbose=0))
        except ImportError:
            recon = None
    if recon is None:
        import jax.numpy as jnp

        from cell_image_analysis_tpu.models.cae import forward as cae_forward

        recon_j, enc_j = cae_forward(host["model"], host["variables"], jnp.asarray(X))
        recon, enc = np.asarray(recon_j), np.asarray(enc_j)

    diff = X.astype(np.float64) - recon.astype(np.float64)
    mse = (diff ** 2).mean(axis=(1, 2, 3))
    feats = enc.reshape(enc.shape[0], -1).astype(np.float64)
    scaled = (feats - np.asarray(host["scaler"].center_, np.float64)) / \
        np.asarray(host["scaler"].scale_, np.float64)
    reduced = (scaled - np.asarray(host["pca"].mean_, np.float64)) @ \
        np.asarray(host["pca"].components_, np.float64).T

    out = {"n_cells": len(cells), "mse": mse}
    for name, svm in (("conservative", host["cons"]), ("moderate", host["mod"])):
        d = _svm_decision_np(svm, reduced)
        pred = np.where(d > 0, 1, -1)
        out[f"{name}_predictions"] = pred
        out[f"{name}_anomaly_rate"] = float((pred == -1).mean()) if len(pred) else 0.0
    votes = ((mse > float(host["ens"].mse_threshold)).astype(int)
             + (out["conservative_predictions"] == -1).astype(int)
             + (out["moderate_predictions"] == -1).astype(int))
    ens = np.where(votes >= min_votes, -1, 1)
    out["ensemble_predictions"] = ens
    out["ensemble_anomaly_rate"] = float((ens == -1).mean()) if len(ens) else 0.0
    if "fft_scaler" in host and "fft_det" in host:
        f = fft_features_np(cells)
        fs = (f - np.asarray(host["fft_scaler"].center_, np.float64)) / \
            np.asarray(host["fft_scaler"].scale_, np.float64)
        d = _svm_decision_np(host["fft_det"], fs)
        pred = np.where(d > 0, 1, -1)
        out["fft_predictions"] = pred
        out["fft_anomaly_rate"] = float((pred == -1).mean()) if len(pred) else 0.0
    return out


def measure_parity(n_frames: int = 4, size: int = 512, n_cells: int = 30,
                   seed: int = 11, use_keras: bool = True,
                   backend: str = "threshold",
                   fit_on_extracted: bool = False) -> dict:
    """Run the same synthetic frames through the fused device pipeline and
    the CPU reference stack; return per-detector rates and the max absolute
    rate deviation (the BASELINE.md north-star).

    backend="stardist" runs the full reference segmentation stack on both
    sides: the device StarDistBackend vs a CPU Keras/TF U-Net forward (same
    weights) + the numpy greedy NMS/rasterization oracle.

    fit_on_extracted=True fits the detectors on cells oracle-extracted from
    DISJOINT frames of the same generator, so the test cells score near nu
    (~5-10% rates) instead of saturating at ~100% — many cells then sit
    near the SVM boundary, making the deviation check maximally sensitive
    to numeric drift (e.g. the TPU single-bf16-pass matmul default that
    the saturated workload can mask)."""
    import jax.numpy as jnp

    from cell_image_analysis_tpu.models.segmentation import threshold_segment
    from cell_image_analysis_tpu.pipeline.scoring import score_frames_fused
    from cell_image_analysis_tpu.utils.bench import (
        _fit_params,
        _make_frames,
        _threshold_mask_fn,
        stardist_backend,
    )

    fit_X = None
    if fit_on_extracted:
        fit_frames = _make_frames(8, size, n_cells, seed=seed + 7919)
        fit_cells = np.concatenate(
            [oracle_extract_cells(f) for f in fit_frames], axis=0)
        assert len(fit_cells) >= 65, (
            f"only {len(fit_cells)} fit cells; PCA(64) needs >= 65")
        fit_X = fit_cells[..., None].astype(np.float32)
    model, params, host = _fit_params(X=fit_X)
    frames = _make_frames(n_frames, size, n_cells, seed=seed)
    stack = np.stack(frames)

    oracle_segment = None
    if backend == "stardist":
        from cell_image_analysis_tpu.utils.bench import _keras_unet_segment_cpu

        sd = stardist_backend()
        fallback = stardist_backend(runs_props=False, raster_mode="scatter")
        scores, stats = score_frames_fused(
            model, params,
            jnp.asarray(stack[..., 2].astype(np.float32)),
            jnp.asarray(stack[..., 1].astype(np.float32)),
            sd, fallback_segment_fn=fallback, rcap=64,
            chunk=32, caps=(64, 96), cell_capacity=128,
            label_capacity=(sd.cfg.raster_cap or sd.cfg.max_candidates),
        )
        _keras_seg = _keras_unet_segment_cpu(size)
        oracle_segment = lambda norm: _keras_seg(norm)
    else:
        scores, stats = score_frames_fused(
            model, params,
            jnp.asarray(stack[..., 2].astype(np.float32)),
            jnp.asarray(stack[..., 1].astype(np.float32)),
            _threshold_mask_fn, fallback_segment_fn=threshold_segment,
            chunk=32, caps=(64, 96), cell_capacity=128, label_capacity=4096,
            fg_fraction=0.12,
        )
    dev = {
        "n_cells": len(stats["area"]),
        "conservative_anomaly_rate":
            float((np.asarray(scores["conservative_predictions"]) == -1).mean()),
        "moderate_anomaly_rate":
            float((np.asarray(scores["moderate_predictions"]) == -1).mean()),
        "ensemble_anomaly_rate":
            float((np.asarray(scores["ensemble_predictions"]) == -1).mean()),
        "fft_anomaly_rate":
            float((np.asarray(scores["fft_predictions"]) == -1).mean()),
    }

    cells = [oracle_extract_cells(f, segment=oracle_segment) for f in frames]
    cells = np.concatenate([c for c in cells if len(c)], axis=0)
    ref = oracle_score(cells, host, use_keras=use_keras)

    detectors = ["conservative", "moderate", "ensemble"]
    if "fft_anomaly_rate" in ref:
        detectors.append("fft")
    deviations = {
        d: abs(dev[f"{d}_anomaly_rate"] - ref[f"{d}_anomaly_rate"])
        for d in detectors
    }
    return {
        "device": dev,
        "reference": {k: v for k, v in ref.items()
                      if k.endswith("rate") or k == "n_cells"},
        "deviations": deviations,
        "max_deviation": max(deviations.values()),
        "cell_count_match": dev["n_cells"] == ref["n_cells"],
    }
