"""The parity north-star (BASELINE.md): device pipeline vs CPU reference.

Runs identical synthetic frames end-to-end through the fused device
screening graph and through the CPU reference stack (scipy segmentation,
numpy regionprops/CLAHE/resize oracles, Keras CAE forward when available,
float64 scaler/PCA/libsvm-form decisions) and gates the max absolute
anomaly-rate deviation at < 1e-3 — which, over a shared ~100-cell set,
means the two paths flag exactly the same cells.
"""

import numpy as np
import pytest

from cell_image_analysis_tpu.utils.parity import measure_parity


@pytest.mark.slow
def test_anomaly_rate_parity_north_star():
    res = measure_parity(n_frames=4, size=512, n_cells=30, seed=11)
    assert res["device"]["n_cells"] > 60, res["device"]
    assert res["cell_count_match"], (
        f"cell sets differ: device {res['device']['n_cells']} vs "
        f"reference {res['reference']['n_cells']}"
    )
    assert res["max_deviation"] < 1e-3, res


@pytest.mark.slow
def test_anomaly_rate_parity_sensitive_workload():
    """fit_on_extracted fits the detectors on pipeline-distribution cells,
    so test cells score near nu with many borderline cells — the workload
    that caught the TPU single-bf16-pass matmul default (BENCH.md r2s9;
    on CPU both paths are f32 so this gates the algorithmic parity)."""
    res = measure_parity(n_frames=4, size=512, n_cells=30, seed=11,
                         fit_on_extracted=True)
    assert res["cell_count_match"], res
    # sensitivity: the workload must NOT saturate (all/none anomalous)
    rates = [v for k, v in res["device"].items() if k.endswith("rate")]
    assert any(0.0 < r < 0.9 for r in rates), res["device"]
    assert res["max_deviation"] < 1e-3, res


@pytest.mark.slow
def test_anomaly_rate_parity_stardist_backend():
    """Same gate through the full StarDist stack: device U-Net -> fixpoint
    NMS -> scatter rasterize -> runs regionprops vs CPU Keras forward ->
    greedy numpy NMS -> numpy rasterize -> numpy regionprops.  Identical
    cell sets means every approximation pair (quadrature-vs-pixel overlap,
    f32-vs-oneDNN conv, tent-vs-gather radius) agrees on this workload."""
    pytest.importorskip("keras")
    res = measure_parity(n_frames=2, size=512, n_cells=24, seed=13,
                         backend="stardist")
    assert res["device"]["n_cells"] > 20, res["device"]
    assert res["cell_count_match"], (
        f"cell sets differ: device {res['device']['n_cells']} vs "
        f"reference {res['reference']['n_cells']}"
    )
    assert res["max_deviation"] < 1e-3, res
