"""Training entry point — `ImprovedAnomalyDetectionTraining`, TPU-native.

Stage-for-stage port of the reference training pipeline
(CAE_improved_modeltrain.py:25-510) onto this framework's device graphs:

  1. create_training_dataset: threaded TIFF ingest -> per-frame jitted
     segmentation + extraction graph -> cell_statistics.csv /
     file_summary.csv / data_quality_report.txt
  2. train_autoencoder: flax CAE + Keras-parity callbacks ->
     best/final/encoder artifacts + training_history.png
  3. evaluate_reconstruction_quality: per-cell MSE/MAE + distribution and
     sample figures
  4. create_anomaly_detector: encoder features -> RobustScaler -> PCA ->
     2x one-class RBF-SVM (+ the explicit ensemble threshold) -> pickles
  5. generate_final_report

Behavioral contracts preserved: <500-cell abort
(CAE_improved_modeltrain.py:491-493), per-image skip-and-log, artifact
file names, report formats, printed baseline anomaly rates
(CAE_improved_modeltrain.py:430-434).
"""

from __future__ import annotations

import os
import jax.numpy as jnp
import numpy as np
import pandas as pd

from cell_image_analysis_tpu import config as C
from cell_image_analysis_tpu.config import PipelineConfig
from cell_image_analysis_tpu.io import artifacts
from cell_image_analysis_tpu.io.ingest import FrameStream, list_tiffs
from cell_image_analysis_tpu.models.cae import encode, reconstruction_errors
from cell_image_analysis_tpu.models.ensemble import EnsembleDetector
from cell_image_analysis_tpu.models.pca import PCA
from cell_image_analysis_tpu.models.scaler import RobustScaler
from cell_image_analysis_tpu.models.segmentation import segment_frame
from cell_image_analysis_tpu.models.svm import OneClassSVM
from cell_image_analysis_tpu.ops.extract import extract_cells_chunked
from cell_image_analysis_tpu.ops.oracle.regionprops_np import convex_area
from cell_image_analysis_tpu.pipeline import reports
from cell_image_analysis_tpu.train.trainer import fit_cae
from cell_image_analysis_tpu.utils.profiler import StageTimer


def _solidity_for_labels(labels: np.ndarray, label_ids: np.ndarray, areas: np.ndarray) -> np.ndarray:
    """Host-side solidity (report-only stat, never a QC gate — SURVEY.md
    section 2.3: convex hull per cell via monotone chain).  Bounding boxes
    are found once with a vectorized pass so each hull only scans its own
    bbox, not the frame."""
    from scipy import ndimage as ndi

    out = np.zeros(len(label_ids), np.float64)
    if not len(label_ids):
        return out
    slices = ndi.find_objects(labels)  # one C pass for every label's bbox
    for i, (lab, area) in enumerate(zip(label_ids, areas)):
        if lab <= 0 or lab > len(slices) or slices[lab - 1] is None:
            continue
        sl = slices[lab - 1]
        rr, cc = np.nonzero(labels[sl] == lab)
        if not len(rr):
            continue
        ca = convex_area(np.stack([rr + sl[0].start, cc + sl[1].start], axis=1))
        out[i] = float(area) / ca if ca else 0.0
    return out


class ImprovedAnomalyDetectionTraining:
    """Reference-equivalent trainer (CAE_improved_modeltrain.py:25)."""

    def __init__(self, output_dir: str, config: PipelineConfig = PipelineConfig(),
                 unet_variables=None, mesh=None):
        self.output_dir = output_dir
        self.config = config
        self.unet_variables = unet_variables
        self.mesh = mesh
        self.timer = StageTimer()
        # identity-stable segmentation callable: the batched stage-A jit
        # caches on segment_fn identity (a fresh lambda per batch re-traces)
        self._segment = lambda s: segment_frame(s, self.config.seg, self.unet_variables)
        os.makedirs(output_dir, exist_ok=True)

    # stage 1 -----------------------------------------------------------------
    def extract_quality_cells(self, seg_channel: np.ndarray, green_channel: np.ndarray):
        """One frame -> (cells (k,64,64) float32, stats list) via the fused
        device graph (reference: CAE_improved_modeltrain.py:39-111)."""
        cfg = self.config
        labels = segment_frame(jnp.asarray(seg_channel.astype(np.float32)), cfg.seg, self.unet_variables)
        cells, st = extract_cells_chunked(
            labels, jnp.asarray(green_channel.astype(np.float32)),
            out_size=cfg.extract.out_size,
            label_capacity=max(cfg.extract.cell_capacity * 2, 1024),
            cell_capacity=cfg.extract.cell_capacity,
            crop_capacity=cfg.extract.crop_capacity,
            border_margin=cfg.qc.border_margin,
            min_area=cfg.qc.min_area,
            max_area=cfg.qc.max_area,
            max_eccentricity=cfg.qc.max_eccentricity,
            min_mean_intensity=cfg.qc.min_mean_intensity,
            min_std_intensity=cfg.qc.min_std_intensity,
        )
        sols = _solidity_for_labels(np.asarray(labels), st["label_ids"], st["area"])
        stats = [
            dict(area=int(a), eccentricity=float(e), solidity=float(s),
                 mean_intensity=float(m), std_intensity=float(sd))
            for a, e, s, m, sd in zip(
                st["area"], st["eccentricity"], sols, st["mean_intensity"], st["std_intensity"]
            )
        ]
        return cells, stats

    def create_training_dataset(self, folder_path: str):
        print("=== Creating High-Quality Training Dataset ===")
        file_paths = list_tiffs(folder_path)
        print(f"Found {len(file_paths)} image files")

        all_cells, all_stats, file_summary = [], [], []

        def flush(pend):
            """Batched extraction of same-shape frames: segmentation + stage A
            run vmapped in ONE dispatch across the batch (the screening path's
            throughput fix applied to training); labels come back as uint16
            for the host-side solidity report stat."""
            if not pend:
                return
            from cell_image_analysis_tpu.ops.extract import extract_cells_frames

            cfg = self.config
            segs = jnp.asarray(np.stack([p[1] for p in pend]).astype(np.float32))
            greens = jnp.asarray(np.stack([p[2] for p in pend]).astype(np.float32))
            try:
                with self.timer.stage("extract_batch"):
                    cells, st, labels16 = extract_cells_frames(
                        segs, greens, self._segment, return_labels=True,
                        out_size=cfg.extract.out_size,
                        label_capacity=max(cfg.extract.cell_capacity * 2, 1024),
                        cell_capacity=cfg.extract.cell_capacity,
                        crop_capacity=cfg.extract.crop_capacity,
                        border_margin=cfg.qc.border_margin,
                        min_area=cfg.qc.min_area,
                        max_area=cfg.qc.max_area,
                        max_eccentricity=cfg.qc.max_eccentricity,
                        min_mean_intensity=cfg.qc.min_mean_intensity,
                        min_std_intensity=cfg.qc.min_std_intensity,
                    )
            except Exception as e:  # skip-and-log (reference behavior)
                for path, _, _ in pend:
                    print(f"Error processing {path}: {e}")
                    file_summary.append(dict(
                        filename=os.path.basename(path), cells_extracted=0,
                        mean_cell_intensity=0))
                pend.clear()
                return
            for f, (path, _, _) in enumerate(pend):
                filename = os.path.basename(path)
                m = st["frame_index"] == f
                sols = _solidity_for_labels(
                    labels16[f].astype(np.int32), st["label_ids"][m], st["area"][m])
                n_f = int(m.sum())
                for a, e, s, mi, sd in zip(
                    st["area"][m], st["eccentricity"][m], sols,
                    st["mean_intensity"][m], st["std_intensity"][m],
                ):
                    all_stats.append(dict(
                        area=int(a), eccentricity=float(e), solidity=float(s),
                        mean_intensity=float(mi), std_intensity=float(sd),
                        file=filename))
                all_cells.append(cells[m])
                file_summary.append(dict(
                    filename=filename,
                    cells_extracted=n_f,
                    mean_cell_intensity=float(st["mean_intensity"][m].mean()) if n_f else 0,
                ))
                print(f"  Extracted {n_f} quality cells")
            pend.clear()

        pend: list = []
        stream = FrameStream(file_paths)
        for i, (path, seg, green) in enumerate(stream):
            print(f"Processing {i + 1}/{len(file_paths)}: {os.path.basename(path)}")
            if pend and seg.shape != pend[0][1].shape:
                flush(pend)
            pend.append((path, seg, green))
            if len(pend) >= 8:
                flush(pend)
        flush(pend)
        for path, err in stream.errors:
            print(f"Error processing {path}: {err}")
            file_summary.append(dict(filename=os.path.basename(path), cells_extracted=0,
                                     mean_cell_intensity=0))

        cells = np.concatenate(all_cells, axis=0) if all_cells else np.zeros((0, 64, 64), np.float32)
        print(f"\nTotal quality cells extracted: {len(cells)}")

        stats_df = pd.DataFrame(all_stats)
        file_summary_df = pd.DataFrame(file_summary)
        reports.write_dataset_csvs(self.output_dir, stats_df, file_summary_df)
        if len(stats_df):
            reports.generate_data_quality_report(self.output_dir, stats_df, file_summary_df)
        return cells, stats_df

    # stage 2 -----------------------------------------------------------------
    def train_autoencoder(self, cell_images: np.ndarray):
        print("=== Training Autoencoder ===")

        saved = {}

        def save_best(variables):
            saved["best"] = variables

        with self.timer.stage("train_cae"):
            model, best_variables, history = fit_cae(
                cell_images,
                cae_cfg=self.config.cae,
                train_cfg=self.config.train,
                aug_cfg=self.config.augment,
                save_best_fn=save_best,
                mesh=self.mesh,
            )
        self._model = model
        self._final_variables = saved.get("best", best_variables)
        reports.plot_training_history(self.output_dir, history.history)
        # best/final/encoder artifacts (CAE_improved_modeltrain.py:271,299-300)
        artifacts.save_cae(os.path.join(self.output_dir, C.ARTIFACT_BEST_AUTOENCODER), model, best_variables)
        artifacts.save_cae(os.path.join(self.output_dir, C.ARTIFACT_FINAL_AUTOENCODER), model, best_variables)
        artifacts.save_cae(os.path.join(self.output_dir, C.ARTIFACT_ENCODER), model, best_variables)
        return model, best_variables, history

    # stage 3 -----------------------------------------------------------------
    def evaluate_reconstruction_quality(self, model, variables, cell_images: np.ndarray):
        print("=== Evaluating Reconstruction Quality ===")
        X = np.asarray(cell_images, np.float32)[..., None]
        with self.timer.stage("recon_eval"):
            mse, mae = reconstruction_errors(model, variables, jnp.asarray(X))
            recon, _ = model.apply(variables, jnp.asarray(X), train=False)
        mse, mae = np.asarray(mse), np.asarray(mae)
        print(f"MSE - Mean: {mse.mean():.6f}, Std: {mse.std():.6f}")
        print(f"MAE - Mean: {mae.mean():.6f}, Std: {mae.std():.6f}")
        reports.plot_reconstruction_errors(self.output_dir, mse, mae)
        reports.plot_reconstruction_samples(self.output_dir, X, np.asarray(recon))
        return mse, mae

    # stage 4 -----------------------------------------------------------------
    def create_anomaly_detector(self, model, variables, cell_images: np.ndarray, mse_errors=None):
        print("=== Creating Anomaly Detector ===")
        X = np.asarray(cell_images, np.float32)[..., None]
        with self.timer.stage("detector_fit"):
            features_flat = np.asarray(encode(model, variables, jnp.asarray(X)))
            print(f"Flattened features shape: {features_flat.shape}")

            scaler = RobustScaler()
            features_scaled = np.asarray(scaler.fit_transform(features_flat))
            n_components = min(self.config.detector.pca_components,
                               features_scaled.shape[1], features_scaled.shape[0] - 1)
            pca = PCA(n_components=n_components)
            features_reduced = np.asarray(pca.fit_transform(features_scaled))
            print(f"PCA reduced to {n_components} components")
            print(f"Explained variance ratio (first 5): {pca.explained_variance_ratio_[:5]}")

            detectors = {
                "Conservative": OneClassSVM(nu=self.config.detector.nu_conservative,
                                            gamma=self.config.detector.gamma),
                "Moderate": OneClassSVM(nu=self.config.detector.nu_moderate,
                                        gamma=self.config.detector.gamma),
            }
            for det in detectors.values():
                det.fit(features_reduced)

        print("\nBaseline anomaly rates:")
        for name, det in detectors.items():
            rate = (det.predict(features_reduced) == -1).mean()
            print(f"{name}: {rate * 100:.2f}%")

        if mse_errors is None:
            mse_errors, _ = (np.asarray(a) for a in
                             reconstruction_errors(model, variables, jnp.asarray(X)))
        ensemble = EnsembleDetector.fit(np.asarray(mse_errors), self.config.ensemble)

        # FFT spectral-feature detector (first-class per BASELINE.json;
        # README.md:3's promised "FFT analysis")
        from cell_image_analysis_tpu.ops.fft_features import fft_features

        fft = np.asarray(fft_features(jnp.asarray(X), radial_bins=self.config.fft.radial_bins,
                                      angular_bins=self.config.fft.angular_bins,
                                      log_power=self.config.fft.log_power))
        fft_scaler = RobustScaler().fit(fft)
        fft_detector = OneClassSVM(nu=self.config.detector.nu_moderate,
                                   gamma=self.config.detector.gamma)
        fft_detector.fit(np.asarray(fft_scaler.transform(fft)))
        fft_rate = (fft_detector.predict(np.asarray(fft_scaler.transform(fft))) == -1).mean()
        print(f"FFT: {fft_rate * 100:.2f}%")

        artifacts.save_training_artifacts(
            self.output_dir, model, variables, self._final_variables,
            scaler, pca, detectors, ensemble,
            fft_scaler=fft_scaler, fft_detector=fft_detector,
        )
        return detectors, scaler, pca, ensemble

    # stage 5 -----------------------------------------------------------------
    def generate_final_report(self, stats_df, history, mse_errors, mae_errors):
        reports.generate_final_report(self.output_dir, stats_df, history.history, mse_errors, mae_errors)

    # full run ------------------------------------------------------------------
    def run(self, folder_path: str) -> bool:
        """The reference main() (CAE_improved_modeltrain.py:480-510)."""
        reports.save_run_parameters(self.output_dir, self.config, {"input_folder": folder_path})
        cell_images, stats_df = self.create_training_dataset(folder_path)
        if len(cell_images) < self.config.train.min_cells:
            print(f"Warning: Only {len(cell_images)} cells available. "
                  f"Recommend >{self.config.train.min_cells} for stable training.")
            return False
        model, variables, history = self.train_autoencoder(cell_images)
        mse_errors, mae_errors = self.evaluate_reconstruction_quality(model, variables, cell_images)
        self.create_anomaly_detector(model, variables, cell_images, mse_errors)
        self.generate_final_report(stats_df, history, mse_errors, mae_errors)
        print("\n=== TRAINING COMPLETED ===")
        print(f"Models and reports saved to: {self.output_dir}")
        print(f"Quality cells used: {len(cell_images)}")
        print(self.timer.report())
        return True
