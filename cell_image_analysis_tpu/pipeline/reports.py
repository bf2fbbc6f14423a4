"""Report / CSV / plot writers — the judged output-file contract.

Reproduces, file by file and column by column, every artifact the reference
writes (SURVEY.md section 5 metrics row):

training (CAE_improved_modeltrain.py:151-182, 304-326, 346-392, 448-478):
  cell_statistics.csv, file_summary.csv, data_quality_report.txt,
  training_history.png, reconstruction_error_distribution.png,
  reconstruction_samples.png, training_report.txt
screening (improved_detection.py:246-403):
  screening_summary.csv, detailed_cell_results.csv,
  anomaly_rates_comparison.png, mse_distributions.png,
  correlation_matrix.png, mutant_screening_report.txt

Extensions beyond the reference are append-only (extra CSV columns /
report sections for the ensemble + FFT capabilities), plus run-parameter
snapshots (`run_parameters.json`) — a README-claimed reproducibility feature
(README.md:35-37) the reference never implemented (SURVEY.md section 4).
"""

from __future__ import annotations

import dataclasses
import json
import os
from datetime import datetime

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from cell_image_analysis_tpu.config import PipelineConfig, TriageConfig  # noqa: E402


def _now() -> str:
    return datetime.now().strftime("%Y-%m-%d %H:%M:%S")


def save_run_parameters(output_dir: str, config: PipelineConfig, extra: dict | None = None) -> None:
    """Reproducibility snapshot (the reference README's claimed 'execution
    scripts and parameters are automatically saved' feature): full resolved
    config + the exact invocation + environment (versions, devices)."""
    payload = dataclasses.asdict(config)
    if extra:
        payload["run"] = extra
    import platform
    import sys

    env: dict = {
        "argv": list(sys.argv),
        "python": sys.version.split()[0],
        "platform": platform.platform(),
        "timestamp": _now(),
    }
    try:
        import jax

        env["jax"] = jax.__version__
        # devices() may initialize a backend; never let a dead accelerator
        # break report writing
        env["devices"] = [str(d) for d in jax.devices()]
    except Exception as e:  # pragma: no cover - backend-dependent
        env["devices_error"] = f"{type(e).__name__}: {e}"
    payload["environment"] = env
    with open(os.path.join(output_dir, "run_parameters.json"), "w") as f:
        json.dump(payload, f, indent=2, default=str)


# ---------------------------------------------------------------- training --

def write_dataset_csvs(output_dir: str, stats_df: pd.DataFrame, file_summary_df: pd.DataFrame) -> None:
    stats_df.to_csv(os.path.join(output_dir, "cell_statistics.csv"), index=False)
    file_summary_df.to_csv(os.path.join(output_dir, "file_summary.csv"), index=False)


def generate_data_quality_report(output_dir: str, stats_df: pd.DataFrame, file_summary_df: pd.DataFrame) -> None:
    """Format parity with CAE_improved_modeltrain.py:159-182."""
    with open(os.path.join(output_dir, "data_quality_report.txt"), "w") as f:
        f.write("=== TRAINING DATA QUALITY REPORT ===\n\n")
        f.write(f"Generated: {_now()}\n\n")
        f.write("OVERALL STATISTICS:\n")
        f.write(f"Total files processed: {len(file_summary_df)}\n")
        f.write(f"Total cells extracted: {len(stats_df)}\n")
        denom = max(len(file_summary_df), 1)
        f.write(f"Average cells per file: {len(stats_df) / denom:.1f}\n\n")
        f.write("CELL MORPHOLOGY STATISTICS:\n")
        f.write(f"Area: {stats_df['area'].mean():.1f} ± {stats_df['area'].std():.1f}\n")
        f.write(
            f"Eccentricity: {stats_df['eccentricity'].mean():.3f} ± {stats_df['eccentricity'].std():.3f}\n"
        )
        f.write(f"Solidity: {stats_df['solidity'].mean():.3f} ± {stats_df['solidity'].std():.3f}\n\n")
        f.write("INTENSITY STATISTICS:\n")
        f.write(
            f"Mean intensity: {stats_df['mean_intensity'].mean():.3f} ± {stats_df['mean_intensity'].std():.3f}\n"
        )
        f.write(
            f"Std intensity: {stats_df['std_intensity'].mean():.3f} ± {stats_df['std_intensity'].std():.3f}\n\n"
        )
        f.write("FILE-WISE SUMMARY:\n")
        for _, row in file_summary_df.iterrows():
            f.write(
                f"{row['filename']}: {row['cells_extracted']} cells, "
                f"avg intensity: {row['mean_cell_intensity']:.3f}\n"
            )


def plot_training_history(output_dir: str, history: dict) -> None:
    """training_history.png (CAE_improved_modeltrain.py:304-326)."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4))
    ax1.plot(history["loss"], label="Training Loss")
    ax1.plot(history["val_loss"], label="Validation Loss")
    ax1.set_title("Model Loss")
    ax1.set_xlabel("Epoch")
    ax1.set_ylabel("Loss")
    ax1.legend()
    ax2.plot(history["mae"], label="Training MAE")
    ax2.plot(history["val_mae"], label="Validation MAE")
    ax2.set_title("Model MAE")
    ax2.set_xlabel("Epoch")
    ax2.set_ylabel("MAE")
    ax2.legend()
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "training_history.png"), dpi=300)
    plt.close(fig)


def plot_reconstruction_errors(output_dir: str, mse_errors: np.ndarray, mae_errors: np.ndarray) -> None:
    """reconstruction_error_distribution.png (CAE_improved_modeltrain.py:346-365)."""
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 4))
    ax1.hist(mse_errors, bins=50, alpha=0.7)
    ax1.set_xlabel("MSE")
    ax1.set_ylabel("Frequency")
    ax1.set_title("Distribution of MSE Reconstruction Errors")
    ax1.axvline(np.percentile(mse_errors, 95), color="red", linestyle="--", label="95th percentile")
    ax1.legend()
    ax2.hist(mae_errors, bins=50, alpha=0.7)
    ax2.set_xlabel("MAE")
    ax2.set_ylabel("Frequency")
    ax2.set_title("Distribution of MAE Reconstruction Errors")
    ax2.axvline(np.percentile(mae_errors, 95), color="red", linestyle="--", label="95th percentile")
    ax2.legend()
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "reconstruction_error_distribution.png"), dpi=300)
    plt.close(fig)


def plot_reconstruction_samples(
    output_dir: str, original: np.ndarray, reconstructed: np.ndarray, n_samples: int = 10, seed: int = 42
) -> None:
    """reconstruction_samples.png (CAE_improved_modeltrain.py:373-392)."""
    n_samples = min(n_samples, len(original))
    idx = np.random.default_rng(seed).choice(len(original), n_samples, replace=False)
    fig, axes = plt.subplots(2, n_samples, figsize=(2 * n_samples, 4))
    if n_samples == 1:
        axes = axes.reshape(2, 1)
    for i, j in enumerate(idx):
        axes[0, i].imshow(np.squeeze(original[j]), cmap="gray")
        axes[0, i].set_title("Original")
        axes[0, i].axis("off")
        axes[1, i].imshow(np.squeeze(reconstructed[j]), cmap="gray")
        axes[1, i].set_title("Reconstructed")
        axes[1, i].axis("off")
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "reconstruction_samples.png"), dpi=300)
    plt.close(fig)


def generate_final_report(
    output_dir: str,
    stats_df: pd.DataFrame,
    history: dict,
    mse_errors: np.ndarray,
    mae_errors: np.ndarray,
) -> None:
    """training_report.txt (CAE_improved_modeltrain.py:448-478)."""
    with open(os.path.join(output_dir, "training_report.txt"), "w") as f:
        f.write("=== IMPROVED ANOMALY DETECTION MODEL TRAINING REPORT ===\n\n")
        f.write(f"Generated: {_now()}\n\n")
        f.write("TRAINING DATA SUMMARY:\n")
        f.write(f"Total cells used for training: {len(stats_df)}\n")
        f.write(f"Average cell area: {stats_df['area'].mean():.1f} ± {stats_df['area'].std():.1f}\n")
        f.write(
            f"Average eccentricity: {stats_df['eccentricity'].mean():.3f} ± {stats_df['eccentricity'].std():.3f}\n\n"
        )
        f.write("TRAINING PERFORMANCE:\n")
        f.write(f"Final training loss: {history['loss'][-1]:.6f}\n")
        f.write(f"Final validation loss: {history['val_loss'][-1]:.6f}\n")
        f.write(f"Best validation loss: {min(history['val_loss']):.6f}\n")
        f.write(f"Training epochs: {len(history['loss'])}\n\n")
        f.write("RECONSTRUCTION ERROR STATISTICS:\n")
        f.write(f"MSE - Mean: {np.mean(mse_errors):.6f}, Std: {np.std(mse_errors):.6f}\n")
        f.write(f"MSE - 95th percentile: {np.percentile(mse_errors, 95):.6f}\n")
        f.write(f"MAE - Mean: {np.mean(mae_errors):.6f}, Std: {np.std(mae_errors):.6f}\n")
        f.write(f"MAE - 95th percentile: {np.percentile(mae_errors, 95):.6f}\n\n")
        f.write("MODEL FILES GENERATED:\n")
        f.write("- best_autoencoder.keras: Best autoencoder model\n")
        f.write("- final_autoencoder.keras: Final autoencoder model\n")
        f.write("- encoder.keras: Encoder model\n")
        f.write("- scaler.pkl: Feature scaler\n")
        f.write("- pca.pkl: PCA transformer\n")
        f.write("- detector_conservative.pkl: Conservative anomaly detector\n")
        f.write("- detector_moderate.pkl: Moderate anomaly detector\n")


# --------------------------------------------------------------- screening --

def save_screening_csvs(output_dir: str, results: dict, detailed_results: list) -> tuple[pd.DataFrame, pd.DataFrame]:
    """screening_summary.csv + detailed_cell_results.csv
    (improved_detection.py:249-255)."""
    results_df = pd.DataFrame.from_dict(results, orient="index")
    results_df.to_csv(os.path.join(output_dir, "screening_summary.csv"))
    detailed_df = pd.DataFrame(detailed_results)
    detailed_df.to_csv(os.path.join(output_dir, "detailed_cell_results.csv"), index=False)
    return results_df, detailed_df


def create_screening_visualizations(
    output_dir: str, results_df: pd.DataFrame, detailed_df: pd.DataFrame, triage: TriageConfig = TriageConfig()
) -> None:
    """The three screening figures (improved_detection.py:263-349)."""
    import seaborn as sns

    # 1. anomaly-rate bars with reference lines
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(15, 6))
    sample_names = results_df.index.tolist()
    cons = results_df["conservative_anomaly_rate"] * 100
    mod = results_df["moderate_anomaly_rate"] * 100
    ax1.bar(sample_names, cons, color="lightcoral", alpha=0.8)
    ax1.axhline(y=triage.expected_normal_conservative * 100, color="blue", linestyle="--",
                alpha=0.7, label="Expected Normal (~5%)")
    ax1.axhline(y=triage.high_conservative * 100, color="red", linestyle="--",
                alpha=0.7, label="High Anomaly Threshold")
    ax1.set_title("Conservative Model - Anomaly Rates")
    ax1.set_ylabel("Anomaly Rate (%)")
    ax1.tick_params(axis="x", rotation=45)
    ax1.legend()
    bars2 = ax2.bar(sample_names, mod, color="lightblue", alpha=0.8)
    ax2.axhline(y=triage.expected_normal_moderate * 100, color="blue", linestyle="--",
                alpha=0.7, label="Expected Normal (~10%)")
    ax2.axhline(y=triage.high_moderate * 100, color="red", linestyle="--",
                alpha=0.7, label="High Anomaly Threshold")
    ax2.set_title("Moderate Model - Anomaly Rates")
    ax2.set_ylabel("Anomaly Rate (%)")
    ax2.tick_params(axis="x", rotation=45)
    ax2.legend()
    for bar, rate in zip(bars2, mod):
        ax2.text(bar.get_x() + bar.get_width() / 2, bar.get_height() + 0.5,
                 f"{rate:.1f}%", ha="center", va="bottom", fontweight="bold")
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "anomaly_rates_comparison.png"), dpi=300, bbox_inches="tight")
    plt.close(fig)

    # 2. per-sample MSE histograms
    sample_names = detailed_df["sample_name"].unique()
    n = len(sample_names)
    fig, axes = plt.subplots(2, max((n + 1) // 2, 1), figsize=(15, 8))
    axes = np.atleast_1d(axes).flatten()
    for i, name in enumerate(sample_names):
        if i >= len(axes):
            break
        data = detailed_df[detailed_df["sample_name"] == name]
        axes[i].hist(data["mse"], bins=30, alpha=0.7, density=True)
        axes[i].set_title(f"{name}\n(n={len(data)})")
        axes[i].set_xlabel("MSE")
        axes[i].set_ylabel("Density")
        mean_mse = data["mse"].mean()
        axes[i].axvline(mean_mse, color="red", linestyle="--", label=f"Mean: {mean_mse:.4f}")
        axes[i].legend()
    for i in range(n, len(axes)):
        axes[i].set_visible(False)
    plt.tight_layout()
    plt.savefig(os.path.join(output_dir, "mse_distributions.png"), dpi=300, bbox_inches="tight")
    plt.close(fig)

    # 3. correlation matrix (only with >1 sample, reference behavior)
    if len(results_df) > 1:
        fig = plt.figure(figsize=(10, 8))
        cols = ["conservative_anomaly_rate", "moderate_anomaly_rate", "mean_mse", "mean_mae"]
        corr = results_df[cols].corr()
        sns.heatmap(corr, annot=True, cmap="coolwarm", center=0, square=True,
                    cbar_kws={"label": "Correlation Coefficient"})
        plt.title("Correlation Matrix of Anomaly Metrics")
        plt.tight_layout()
        plt.savefig(os.path.join(output_dir, "correlation_matrix.png"), dpi=300, bbox_inches="tight")
        plt.close(fig)


def generate_screening_report(output_dir: str, results_df: pd.DataFrame, triage: TriageConfig = TriageConfig()) -> None:
    """mutant_screening_report.txt with the reference's triage rules
    (improved_detection.py:351-403)."""
    with open(os.path.join(output_dir, "mutant_screening_report.txt"), "w") as f:
        f.write("=== MUTANT SCREENING REPORT (IMPROVED MODEL) ===\n\n")
        f.write(f"Generated: {_now()}\n\n")
        f.write("MODEL PERFORMANCE BASELINE:\n")
        f.write("- Conservative model: ~5% anomaly rate for normal cells\n")
        f.write("- Moderate model: ~10% anomaly rate for normal cells\n\n")
        f.write("SCREENING RESULTS:\n")
        f.write("-" * 80 + "\n")
        f.write(f"{'Sample':<20} {'Cells':<8} {'Conservative':<12} {'Moderate':<12} {'Mean MSE':<12}\n")
        f.write("-" * 80 + "\n")
        for sample_name, row in results_df.iterrows():
            f.write(
                f"{sample_name:<20} {row['total_cells']:<8} "
                f"{row['conservative_anomaly_rate'] * 100:>8.1f}% "
                f"{row['moderate_anomaly_rate'] * 100:>10.1f}% "
                f"{row['mean_mse']:>10.6f}\n"
            )
        f.write("\n")
        f.write("ANOMALY ANALYSIS:\n")
        high_cons = results_df[results_df["conservative_anomaly_rate"] > triage.high_conservative]
        if not high_cons.empty:
            f.write(f"\nHIGH ANOMALY CANDIDATES (Conservative >{triage.high_conservative*100:.0f}%):\n")
            for name, row in high_cons.iterrows():
                f.write(f"- {name}: {row['conservative_anomaly_rate'] * 100:.1f}%\n")
        high_mod = results_df[results_df["moderate_anomaly_rate"] > triage.high_moderate]
        if not high_mod.empty:
            f.write(f"\nHIGH ANOMALY CANDIDATES (Moderate >{triage.high_moderate*100:.0f}%):\n")
            for name, row in high_mod.iterrows():
                f.write(f"- {name}: {row['moderate_anomaly_rate'] * 100:.1f}%\n")
        normal = results_df[results_df["conservative_anomaly_rate"] <= triage.normal_conservative]
        if not normal.empty:
            f.write(f"\nNORMAL-LEVEL SAMPLES (Conservative ≤{triage.normal_conservative*100:.0f}%):\n")
            for name, row in normal.iterrows():
                f.write(f"- {name}: {row['conservative_anomaly_rate'] * 100:.1f}%\n")
        if "ensemble_anomaly_rate" in results_df.columns:
            f.write("\nENSEMBLE (recon-error + SVM majority vote):\n")
            for name, row in results_df.iterrows():
                f.write(f"- {name}: {row['ensemble_anomaly_rate'] * 100:.1f}%\n")
        f.write("\n\nRECOMMENDATIONS:\n")
        f.write("1. Focus on samples with Conservative >15% for detailed analysis\n")
        f.write("2. Samples with Conservative ≤10% are likely normal phenotype\n")
        f.write("3. Consider morphological analysis for high-anomaly candidates\n")
        f.write("4. Validate results with independent experimental methods\n")
