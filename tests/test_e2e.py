"""Golden-file end-to-end test: train -> artifacts -> screen on synthetic TIFFs.

SURVEY.md section 4 test strategy: golden-file integration tests for the two
entry points on a small synthetic TIFF set; the ~nu anomaly-rate property as
the cheap end-to-end invariant; mutants must score above wild-type.
"""

import os

import numpy as np
import pandas as pd
import pytest

pytestmark = pytest.mark.slow  # heavy e2e module (70s session fixture)

from cell_image_analysis_tpu.config import (
    OUTPUT_FILES_SCREENING,
    OUTPUT_FILES_TRAINING,
    PipelineConfig,
    TrainConfig,
)
from cell_image_analysis_tpu.pipeline.screening import ProductionMutantScreening
from cell_image_analysis_tpu.pipeline.training import ImprovedAnomalyDetectionTraining
from cell_image_analysis_tpu.utils.synthetic import make_dataset


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    train_dir = str(root / "train_imgs")
    make_dataset(train_dir, n_frames=6, size=384, n_cells=22, seed=1)
    out = str(root / "model_out")
    cfg = PipelineConfig(train=TrainConfig(epochs=4, min_cells=50))
    trainer = ImprovedAnomalyDetectionTraining(out, cfg)
    ok = trainer.run(train_dir)
    assert ok
    return root, out, cfg


def test_training_outputs_complete(trained):
    _, out, _ = trained
    for name in OUTPUT_FILES_TRAINING:
        assert os.path.exists(os.path.join(out, name)), name
    for name in ("best_autoencoder.keras", "final_autoencoder.keras", "encoder.keras",
                 "scaler.pkl", "pca.pkl", "detector_conservative.pkl",
                 "detector_moderate.pkl", "ensemble.json", "run_parameters.json"):
        assert os.path.exists(os.path.join(out, name)), name
    stats = pd.read_csv(os.path.join(out, "cell_statistics.csv"))
    assert list(stats.columns) == ["area", "eccentricity", "solidity",
                                   "mean_intensity", "std_intensity", "file"]
    assert (stats["area"] >= 200).all() and (stats["area"] <= 8000).all()
    assert (stats["eccentricity"] <= 0.95).all()
    summary = pd.read_csv(os.path.join(out, "file_summary.csv"))
    assert list(summary.columns) == ["filename", "cells_extracted", "mean_cell_intensity"]
    import json

    with open(os.path.join(out, "run_parameters.json")) as f:
        snap = json.load(f)
    # reproducibility snapshot: resolved config + invocation + environment
    # (reference README's 'scripts and parameters automatically saved')
    assert "environment" in snap and "argv" in snap["environment"]
    assert "python" in snap["environment"] and "jax" in snap["environment"]
    assert "qc" in snap and "train" in snap


def test_training_aborts_below_min_cells(trained, tmp_path):
    root, _, _ = trained
    small = str(tmp_path / "tiny")
    make_dataset(small, n_frames=1, size=384, n_cells=4, seed=9)
    out = str(tmp_path / "out")
    trainer = ImprovedAnomalyDetectionTraining(out, PipelineConfig())
    assert trainer.run(small) is False  # <500-cell abort


def test_screening_end_to_end(trained):
    root, model_out, cfg = trained
    wt_dir = str(root / "wt")
    mut_dir = str(root / "mut")
    make_dataset(wt_dir, n_frames=3, size=384, n_cells=22, seed=2)
    make_dataset(mut_dir, n_frames=3, size=384, n_cells=22, mutant_fraction=0.7, seed=3)

    out = str(root / "screen_out")
    screener = ProductionMutantScreening(model_out, cfg)
    results, detailed = screener.screen_mutant_samples(
        {"wildtype": wt_dir, "mutantA": mut_dir}, out
    )

    for name in OUTPUT_FILES_SCREENING:
        assert os.path.exists(os.path.join(out, name)), name

    summary = pd.read_csv(os.path.join(out, "screening_summary.csv"), index_col=0)
    assert {"sample_name", "total_cells", "files_processed",
            "conservative_anomaly_rate", "moderate_anomaly_rate",
            "mean_mse", "std_mse", "mean_mae", "std_mae"} <= set(summary.columns)
    detailed_df = pd.read_csv(os.path.join(out, "detailed_cell_results.csv"))
    assert {"sample_name", "cell_id", "mse", "mae", "conservative_anomaly",
            "moderate_anomaly", "conservative_score", "moderate_score"} <= set(detailed_df.columns)

    # e2e invariants: wild-type near nu; mutants score higher on every detector
    wt = results["wildtype"]
    mut = results["mutantA"]
    assert wt["total_cells"] > 20 and mut["total_cells"] > 20
    # Window: on the TRAINING distribution the one-class-SVM rate ~= nu=0.05
    # (asserted tightly in test_scoring.test_training_set_rates_approximate_nu);
    # held-out wild-type frames shift it upward (fresh cells, ~30-cell
    # samples: binomial sd ~ sqrt(p(1-p)/30) ~ 6%).  nu + 4 sd ~ 0.30 keeps
    # the gate meaningful without flaking on sampling noise.
    assert wt["conservative_anomaly_rate"] < 0.30
    assert mut["moderate_anomaly_rate"] > wt["moderate_anomaly_rate"]
    assert mut["conservative_anomaly_rate"] > wt["conservative_anomaly_rate"]


def test_screening_failure_paths(trained, tmp_path, capsys):
    """Reference failure semantics (SURVEY.md section 2.2.8): empty folders
    and zero-cell samples are skipped with a message (improved_detection.py:
    168-170, 194-196); a corrupt TIFF is skipped with a per-file error log
    and the rest of the folder still screens (improved_detection.py:113-115)."""
    root, model_out, cfg = trained
    empty_dir = str(tmp_path / "empty")
    os.makedirs(empty_dir)
    blank_dir = str(tmp_path / "blank")  # frames with no cells -> 0 QC cells
    make_dataset(blank_dir, n_frames=1, size=384, n_cells=0, seed=4)
    mixed_dir = str(tmp_path / "mixed")  # one good frame + one corrupt file
    make_dataset(mixed_dir, n_frames=1, size=384, n_cells=22, seed=5)
    with open(os.path.join(mixed_dir, "corrupt.tif"), "wb") as f:
        f.write(b"not a tiff at all")

    out = str(tmp_path / "screen_out")
    screener = ProductionMutantScreening(model_out, cfg)
    results, detailed = screener.screen_mutant_samples(
        {"empty": empty_dir, "blank": blank_dir, "mixed": mixed_dir}, out
    )
    printed = capsys.readouterr().out
    assert "No .tif files found" in printed
    assert "Error processing" in printed and "corrupt.tif" in printed
    assert set(results) == {"mixed"}  # empty + zero-cell samples skipped
    assert results["mixed"]["total_cells"] > 5
    for name in OUTPUT_FILES_SCREENING:
        if name == "correlation_matrix.png":
            continue  # reference: heatmap only when >1 sample (improved_detection.py:339)
        assert os.path.exists(os.path.join(out, name)), name
