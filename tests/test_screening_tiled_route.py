"""ProductionMutantScreening's tiled plate route (score_tiled).

The r4 ADVICE found the tiled route bypassed the area-scaled capacities
(the fix landed in r5: per-TILE scaling + overflow re-run checks).  These
tests drive the route end-to-end on the virtual 8-device CPU mesh:
equality with the fused (no-mesh) path, and the cell_capacity
overflow -> 4x re-run recovery.
"""

import numpy as np
import pytest

from cell_image_analysis_tpu.config import (
    ExtractConfig,
    PipelineConfig,
    SegConfig,
)
from cell_image_analysis_tpu.io.artifacts import save_training_artifacts
from cell_image_analysis_tpu.io.tiff import imwrite
from cell_image_analysis_tpu.parallel.mesh import make_mesh
from cell_image_analysis_tpu.pipeline.screening import ProductionMutantScreening
from cell_image_analysis_tpu.utils.bench import _fit_params
from cell_image_analysis_tpu.utils.synthetic import make_frame


def _artifacts(tmp_path):
    model, params, host = _fit_params()
    model_dir = tmp_path / "model"
    save_training_artifacts(
        str(model_dir), model, host["variables"], host["variables"],
        host["scaler"], host["pca"],
        {"Conservative": host["cons"], "Moderate": host["mod"]},
        ensemble=host["ens"],
    )
    return str(model_dir)


def _cfg(**extract_kw):
    return PipelineConfig(
        seg=SegConfig(backend="threshold"),
        extract=ExtractConfig(tile_min_side=256, **extract_kw),
    )


def _screen(model_dir, cfg, folder, out, mesh=None):
    s = ProductionMutantScreening(model_dir, cfg, mesh=mesh)
    results, _ = s.screen_mutant_samples({"s": folder}, str(out))
    return results["s"]


@pytest.mark.slow
def test_screening_tiled_route_matches_fused(rng, tmp_path):
    model_dir = _artifacts(tmp_path)
    frame = make_frame(rng, size=512, n_cells=30)
    folder = tmp_path / "plate"
    folder.mkdir()
    imwrite(str(folder / "f0.tif"), frame)

    cfg = _cfg(cell_capacity=64)
    fused = _screen(model_dir, cfg, str(folder), tmp_path / "o1")
    tiled = _screen(model_dir, cfg, str(folder), tmp_path / "o2",
                    mesh=make_mesh(8))
    assert tiled["total_cells"] == fused["total_cells"] > 5
    for det in ("conservative", "moderate", "ensemble", "fft"):
        assert tiled[f"{det}_anomaly_rate"] == fused[f"{det}_anomaly_rate"], det


@pytest.mark.slow
def test_screening_tiled_cell_overflow_rerun_recovers(rng, tmp_path, capsys):
    model_dir = _artifacts(tmp_path)
    frame = make_frame(rng, size=512, n_cells=30)
    folder = tmp_path / "plate"
    folder.mkdir()
    imwrite(str(folder / "f0.tif"), frame)

    ample = _screen(model_dir, _cfg(cell_capacity=64), str(folder),
                    tmp_path / "o1", mesh=make_mesh(8))
    # capacity 2/tile truncates; the overflow flag must fire and the 4x
    # re-run (capacity 8/tile) must recover every cell
    tight = _screen(model_dir, _cfg(cell_capacity=2), str(folder),
                    tmp_path / "o2", mesh=make_mesh(8))
    out = capsys.readouterr().out
    assert "cell_capacity overflow -> 4x re-run" in out
    assert tight["total_cells"] == ample["total_cells"] > 5
