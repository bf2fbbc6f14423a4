"""Large-frame tiled screening path == fused batch path (SURVEY §2.4).

The screening pipeline routes frames with min side >= ExtractConfig.
tile_min_side through tiled_extract_cells + compute_anomaly_scores when a
mesh is attached (pipeline/screening.py).  This asserts that route produces
the same cells and the same anomaly decisions as the fused single-device
graph on a 2048^2 plate.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from cell_image_analysis_tpu.models.segmentation import threshold_segment
from cell_image_analysis_tpu.parallel.mesh import make_mesh
from cell_image_analysis_tpu.parallel.tiling import tiled_extract_cells
from cell_image_analysis_tpu.pipeline.scoring import (
    compute_anomaly_scores,
    score_frames_fused,
)
from cell_image_analysis_tpu.utils.bench import _fit_params, _threshold_mask_fn
from cell_image_analysis_tpu.utils.synthetic import make_frame


@pytest.mark.slow
def test_tiled_screening_matches_fused_2048(rng):
    mesh = make_mesh(8)
    model, params, _ = _fit_params()
    frame = make_frame(rng, size=2048, n_cells=60)
    seg = frame[..., 2].astype(np.float32)
    green = frame[..., 1].astype(np.float32)

    # fused single-device reference (the normal screening path)
    scores_ref, stats_ref = score_frames_fused(
        model, params, jnp.asarray(seg)[None], jnp.asarray(green)[None],
        _threshold_mask_fn, fallback_segment_fn=threshold_segment,
        chunk=32, caps=(64, 96), cell_capacity=256, label_capacity=4096,
        fg_fraction=0.12,
    )

    # tiled route (what pipeline/screening.py uses for large plates)
    tiled = tiled_extract_cells(
        jnp.asarray(seg), jnp.asarray(green), mesh,
        halo=192, cell_capacity=64, crop_capacity=192,
    )
    valid = np.asarray(tiled.valid)
    scores_tiled = compute_anomaly_scores(
        model, params, tiled.cells, valid=valid
    )

    n_ref = len(scores_ref["reconstruction_mse"])
    n_tiled = len(scores_tiled["reconstruction_mse"])
    assert n_ref == n_tiled > 20, (n_ref, n_tiled)

    # identical cells -> identical decisions; order differs (row-band order
    # vs frame raster order), so compare as sorted multisets
    np.testing.assert_allclose(
        np.sort(scores_tiled["reconstruction_mse"]),
        np.sort(scores_ref["reconstruction_mse"]),
        atol=1e-6,
    )
    for det in ("conservative", "moderate", "ensemble", "fft"):
        assert (
            scores_tiled[f"{det}_anomaly_rate"]
            == scores_ref[f"{det}_anomaly_rate"]
        ), det
