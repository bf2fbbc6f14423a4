"""Sharded scoring equals single-device scoring bit-for-bit (SURVEY.md §4)."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cell_image_analysis_tpu.parallel.mesh import make_mesh
from cell_image_analysis_tpu.parallel.sharding import masked_anomaly_rate, replicate
from cell_image_analysis_tpu.pipeline.scoring import score_cells
from tests.test_scoring import _fitted_params


def test_sharded_scoring_matches_single_device(rng):
    model, params, _, X = _fitted_params(rng, n_train=120)
    batch = jnp.asarray(X[:64])

    single = score_cells(model, params, batch)

    mesh = make_mesh(8)
    params_r = replicate(mesh, params)
    batch_s = jax.device_put(batch, NamedSharding(mesh, P("data")))
    sharded = score_cells(model, params_r, batch_s)

    np.testing.assert_array_equal(
        np.asarray(single.conservative_predictions),
        np.asarray(sharded.conservative_predictions),
    )
    np.testing.assert_allclose(
        np.asarray(single.reconstruction_mse),
        np.asarray(sharded.reconstruction_mse), atol=1e-6,
    )
    # psum-reduced anomaly rate identical
    r1 = float(masked_anomaly_rate(single.conservative_predictions,
                                   jnp.ones(64, bool)))
    r2 = float(masked_anomaly_rate(sharded.conservative_predictions,
                                   jax.device_put(jnp.ones(64, bool), NamedSharding(mesh, P("data")))))
    assert r1 == r2


@pytest.mark.slow
def test_score_frames_sharded_matches_unsharded(rng):
    from cell_image_analysis_tpu.models.segmentation import threshold_segment
    from cell_image_analysis_tpu.pipeline.scoring import score_frames
    from cell_image_analysis_tpu.utils.synthetic import make_frame

    model, params, _, _ = _fitted_params(rng, n_train=120)
    frames = [make_frame(rng, size=256, n_cells=8) for _ in range(8)]
    segs = jnp.asarray(np.stack([f[..., 2] for f in frames]).astype(np.float32))
    greens = jnp.asarray(np.stack([f[..., 1] for f in frames]).astype(np.float32))

    ref, ref_stats = score_frames(model, params, segs, greens, threshold_segment,
                                  chunk=16, cell_capacity=32)
    mesh = make_mesh(8)
    out, out_stats = score_frames(model, params, segs, greens, threshold_segment,
                                  chunk=16, cell_capacity=32, mesh=mesh)
    np.testing.assert_array_equal(ref_stats["area"], out_stats["area"])
    np.testing.assert_allclose(ref["reconstruction_mse"], out["reconstruction_mse"], atol=1e-5)
    np.testing.assert_array_equal(ref["conservative_predictions"], out["conservative_predictions"])
    assert ref["moderate_anomaly_rate"] == out["moderate_anomaly_rate"]


@pytest.mark.slow
def test_score_frames_fused_sharded_matches_unsharded(rng):
    # the mesh path of the fused single-dispatch graph (shard_map over
    # 'data', whole body per shard) must equal the single-device fused path
    from cell_image_analysis_tpu.models.segmentation import threshold_segment
    from cell_image_analysis_tpu.pipeline.scoring import score_frames_fused
    from cell_image_analysis_tpu.utils.synthetic import make_frame

    model, params, _, _ = _fitted_params(rng, n_train=120)
    frames = [make_frame(rng, size=256, n_cells=8) for _ in range(8)]
    segs = jnp.asarray(np.stack([f[..., 2] for f in frames]).astype(np.float32))
    greens = jnp.asarray(np.stack([f[..., 1] for f in frames]).astype(np.float32))

    kw = dict(chunk=16, cell_capacity=32)
    ref, ref_stats = score_frames_fused(model, params, segs, greens,
                                        threshold_segment, **kw)
    mesh = make_mesh(8)
    out, out_stats = score_frames_fused(model, params, segs, greens,
                                        threshold_segment, mesh=mesh, **kw)
    np.testing.assert_array_equal(ref_stats["frame_index"], out_stats["frame_index"])
    np.testing.assert_array_equal(ref_stats["area"], out_stats["area"])
    for k in ref:
        if k.endswith("_rate"):
            assert ref[k] == out[k], k
        else:
            np.testing.assert_allclose(out[k], ref[k], atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_score_frames_fused_sharded_stardist(rng):
    """The StarDist backend (U-Net -> NMS -> rasterize -> runs regionprops)
    through the fused mesh path must equal its single-device run — the
    multi-chip evidence for the reference's actual segmentation stack."""
    from cell_image_analysis_tpu.config import SegConfig
    from cell_image_analysis_tpu.models.segmentation import StarDistBackend
    from cell_image_analysis_tpu.pipeline.scoring import score_frames_fused
    from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables
    from cell_image_analysis_tpu.utils.synthetic import make_frame

    model, params, _, _ = _fitted_params(rng, n_train=120)
    uvars = load_synthetic_unet_variables()
    backend = StarDistBackend(
        uvars, SegConfig(max_candidates=64, raster_patch=64, raster_cap=32)
    )
    frames = [make_frame(rng, size=256, n_cells=5) for _ in range(8)]
    segs = jnp.asarray(np.stack([f[..., 2] for f in frames]).astype(np.float32))
    greens = jnp.asarray(np.stack([f[..., 1] for f in frames]).astype(np.float32))

    kw = dict(chunk=16, cell_capacity=32, label_capacity=32, rcap=64)
    ref, ref_stats = score_frames_fused(model, params, segs, greens,
                                        backend, **kw)
    mesh = make_mesh(8)
    out, out_stats = score_frames_fused(model, params, segs, greens,
                                        backend, mesh=mesh, **kw)
    assert len(ref_stats["area"]) > 10
    np.testing.assert_array_equal(ref_stats["frame_index"], out_stats["frame_index"])
    np.testing.assert_array_equal(ref_stats["area"], out_stats["area"])
    for k in ref:
        if k.endswith("_rate"):
            assert ref[k] == out[k], k
        else:
            np.testing.assert_allclose(out[k], ref[k], atol=1e-5, err_msg=k)
