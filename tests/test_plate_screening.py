"""Plate-scale production screening uses area-scaled capacities (r4s3/r4s4).

ProductionMutantScreening._segment_for must scale the StarDist capacity
knobs with frame area: before it existed, BOTH committed plate-scale bench
rows were silently candidate-capped (~5% of planted cells extracted at
4096^2 — BENCH.md r4s3).  This is the e2e regression test VERDICT r4 item 5
asked for: a 2048^2 frame where the UNSCALED defaults provably bind
(cand_overflow fires) screens to ~the planted QC-pass density through the
production path, and the per-shape backend cache holds identity stable.

Isolated into a subprocess (conftest _ISOLATE_MODULES): the 2048^2 fused
StarDist graph at 4x capacities is among the suite's largest allocations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cell_image_analysis_tpu.config import (
    ExtractConfig,
    PipelineConfig,
    SegConfig,
)
from cell_image_analysis_tpu.io.artifacts import save_training_artifacts
from cell_image_analysis_tpu.io.tiff import imwrite
from cell_image_analysis_tpu.pipeline.screening import ProductionMutantScreening
from cell_image_analysis_tpu.utils.bench import (
    _fit_params,
    load_synthetic_unet_variables,
)
from cell_image_analysis_tpu.utils.synthetic import make_frame_instances


@pytest.mark.slow
def test_screening_2048_area_scaled_capacities(rng, tmp_path):
    from cell_image_analysis_tpu.models.stardist import predict_instances

    model, params, host = _fit_params()
    model_dir = tmp_path / "model"
    save_training_artifacts(
        str(model_dir), model, host["variables"], host["variables"],
        host["scaler"], host["pca"],
        {"Conservative": host["cons"], "Moderate": host["mod"]},
        ensemble=host["ens"],
    )

    planted = 400
    frame, labels = make_frame_instances(rng, size=2048, n_cells=planted,
                                         clustering=0.2)
    folder = tmp_path / "plate"
    folder.mkdir()
    imwrite(str(folder / "frame_000.tif"), frame)

    # max_candidates=128 binds at this density on the raw (unscaled) config
    cfg = PipelineConfig(
        seg=SegConfig(backend="stardist", max_candidates=128,
                      raster_patch=64),
        extract=ExtractConfig(cell_capacity=128),
    )
    screener = ProductionMutantScreening(
        str(model_dir), cfg, unet_variables=load_synthetic_unet_variables()
    )

    # prove the premise: the 1024^2-tuned backend overflows on this plate
    seg = jnp.asarray(frame[..., 2].astype(np.float32))
    base = screener._segment
    _, details = predict_instances(seg, base.variables, base.cfg,
                                   model=base.model)
    assert bool(details.cand_overflow), (
        "unscaled max_candidates must bind on the 400-cell 2048^2 plate "
        "(the test premise — raise planted density if this fails)"
    )

    # the production path must route through the x4 area-scaled backend
    primary, fallback = screener._segment_for(2048, 2048)
    assert primary.cfg.max_candidates == 128 * 4
    assert not fallback.runs_props
    again, _ = screener._segment_for(2048, 2048)
    assert again is primary, "per-shape backend cache must hold identity"

    out = tmp_path / "screen"
    results, detailed = screener.screen_mutant_samples(
        {"plate": str(folder)}, str(out)
    )
    total = results["plate"]["total_cells"]
    # honest density: U-Net coverage ~0.7 x QC pass; the capacity-bound
    # failure mode this guards against extracted ~5-25% of planted
    assert total >= 0.35 * planted, (total, planted)
