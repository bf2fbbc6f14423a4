"""End-to-end screening through the StarDist production backend.

ProductionMutantScreening with SegConfig(backend='stardist') must run the
optimized StarDistBackend (raster-capped, runs-based stage A) through the
fused batch path and produce the reference output contract.
"""

import dataclasses
import os

import numpy as np
import pytest

from cell_image_analysis_tpu.config import (
    ExtractConfig,
    PipelineConfig,
    SegConfig,
)
from cell_image_analysis_tpu.io.artifacts import save_training_artifacts
from cell_image_analysis_tpu.models.ensemble import EnsembleDetector
from cell_image_analysis_tpu.pipeline.screening import ProductionMutantScreening
from cell_image_analysis_tpu.utils.bench import (
    _fit_params,
    load_synthetic_unet_variables,
)
from cell_image_analysis_tpu.utils.synthetic import make_dataset


@pytest.mark.slow
def test_screening_stardist_backend(rng, tmp_path):
    from cell_image_analysis_tpu.models.segmentation import StarDistBackend

    model, params, host = _fit_params()
    model_dir = tmp_path / "model"
    save_training_artifacts(
        str(model_dir), model, host["variables"], host["variables"],
        host["scaler"], host["pca"],
        {"Conservative": host["cons"], "Moderate": host["mod"]},
        ensemble=host["ens"],
    )
    make_dataset(str(tmp_path / "wt"), n_frames=3, size=256, n_cells=6, seed=2)

    cfg = PipelineConfig(
        seg=SegConfig(backend="stardist", max_candidates=128,
                      raster_patch=64, raster_cap=64),
        extract=ExtractConfig(cell_capacity=64),
    )
    screener = ProductionMutantScreening(
        str(model_dir), cfg, unet_variables=load_synthetic_unet_variables()
    )
    assert isinstance(screener._segment, StarDistBackend)
    assert screener._segment.runs_props
    assert screener._segment_fallback is not None
    assert not screener._segment_fallback.runs_props

    out = tmp_path / "screen"
    results, detailed = screener.screen_mutant_samples(
        {"wildtype": str(tmp_path / "wt")}, str(out)
    )
    assert "wildtype" in results
    r = results["wildtype"]
    assert r["total_cells"] > 5, r
    assert 0.0 <= r["conservative_anomaly_rate"] <= 1.0
    for f in ("screening_summary.csv", "detailed_cell_results.csv",
              "mutant_screening_report.txt"):
        assert os.path.exists(out / f), f
