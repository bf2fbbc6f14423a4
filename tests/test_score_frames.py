"""Device-resident frame screening equals the stagewise path."""

import pytest
import numpy as np
import jax.numpy as jnp

from cell_image_analysis_tpu.models.segmentation import threshold_segment
from cell_image_analysis_tpu.ops.extract import extract_cells_chunked
from cell_image_analysis_tpu.pipeline.scoring import (
    compute_anomaly_scores,
    score_frames,
    score_frames_fused,
)
from cell_image_analysis_tpu.utils.synthetic import make_frame
from tests.test_scoring import _fitted_params


@pytest.mark.slow
def test_score_frames_matches_stagewise(rng):
    model, params, _, _ = _fitted_params(rng, n_train=120)
    frames = [make_frame(rng, size=256, n_cells=8) for _ in range(3)]
    segs = jnp.asarray(np.stack([f[..., 2] for f in frames]).astype(np.float32))
    greens = jnp.asarray(np.stack([f[..., 1] for f in frames]).astype(np.float32))

    scores, stats = score_frames(model, params, segs, greens, threshold_segment,
                                 chunk=8, cell_capacity=32)

    # stagewise reference
    ref_cells = []
    for f in frames:
        labels = threshold_segment(jnp.asarray(f[..., 2].astype(np.float32)))
        c, _ = extract_cells_chunked(labels, jnp.asarray(f[..., 1].astype(np.float32)),
                                     chunk=8, cell_capacity=32)
        ref_cells.append(c)
    ref = compute_anomaly_scores(model, params, np.concatenate(ref_cells))

    n = len(stats["area"])
    assert n == sum(len(c) for c in ref_cells) and n > 5
    np.testing.assert_allclose(scores["reconstruction_mse"], ref["reconstruction_mse"], atol=1e-5)
    np.testing.assert_array_equal(scores["conservative_predictions"], ref["conservative_predictions"])
    np.testing.assert_array_equal(scores["ensemble_predictions"], ref["ensemble_predictions"])
    np.testing.assert_allclose(scores["moderate_scores"], ref["moderate_scores"], atol=1e-4)
    assert scores["conservative_anomaly_rate"] == ref["conservative_anomaly_rate"]


@pytest.mark.slow
def test_score_frames_fused_matches_chunked(rng):
    # the single-dispatch fori_loop graph must reproduce the host-chunked
    # path exactly (same kernels, same pool order), incl. bucket tails
    model, params, _, _ = _fitted_params(rng, n_train=120)
    frames = [make_frame(rng, size=256, n_cells=8) for _ in range(3)]
    segs = jnp.asarray(np.stack([f[..., 2] for f in frames]).astype(np.float32))
    greens = jnp.asarray(np.stack([f[..., 1] for f in frames]).astype(np.float32))

    kw = dict(chunk=8, cell_capacity=32)
    ref, ref_stats = score_frames(model, params, segs, greens, threshold_segment, **kw)
    got, got_stats = score_frames_fused(model, params, segs, greens, threshold_segment, **kw)

    np.testing.assert_array_equal(got_stats["label_ids"], ref_stats["label_ids"])
    np.testing.assert_array_equal(got_stats["frame_index"], ref_stats["frame_index"])
    for k in ref:
        if k.endswith("_rate"):
            assert got[k] == ref[k], k
        else:
            np.testing.assert_allclose(got[k], ref[k], atol=1e-5, err_msg=k)


def _threshold_mask_fn(s):
    from cell_image_analysis_tpu.models.segmentation import threshold_mask

    return threshold_mask(s)


_threshold_mask_fn.returns_mask = True


@pytest.mark.slow
def test_score_frames_fused_mask_path_matches_label_path(rng):
    # the production run-length path (mask segment_fn -> ops/runs.py CC +
    # regionprops, no label map) must reproduce the exact pixel path:
    # identical survivors, stats, and scores (area/bbox are bit-exact;
    # centroid/ecc agree to f32 tolerance which QC thresholds absorb)
    model, params, _, _ = _fitted_params(rng, n_train=120)
    frames = [make_frame(rng, size=256, n_cells=8) for _ in range(3)]
    segs = jnp.asarray(np.stack([f[..., 2] for f in frames]).astype(np.float32))
    greens = jnp.asarray(np.stack([f[..., 1] for f in frames]).astype(np.float32))

    kw = dict(chunk=8, cell_capacity=32)
    ref, ref_stats = score_frames_fused(model, params, segs, greens, threshold_segment, **kw)
    got, got_stats = score_frames_fused(
        model, params, segs, greens, _threshold_mask_fn,
        fallback_segment_fn=threshold_segment, **kw,
    )

    assert len(got_stats["area"]) == len(ref_stats["area"]) > 5
    np.testing.assert_array_equal(got_stats["label_ids"], ref_stats["label_ids"])
    np.testing.assert_array_equal(got_stats["area"], ref_stats["area"])
    np.testing.assert_array_equal(got_stats["frame_index"], ref_stats["frame_index"])
    np.testing.assert_allclose(got_stats["eccentricity"], ref_stats["eccentricity"], atol=1e-4)
    for k in ref:
        if k.endswith("_rate"):
            assert got[k] == ref[k], k
        else:
            np.testing.assert_allclose(got[k], ref[k], atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_score_frames_mask_overflow_falls_back(rng):
    # a mask with > rcap runs in a row must trip the overflow flag and
    # reroute through the exact label path, reproducing it bit-for-bit
    model, params, _, _ = _fitted_params(rng, n_train=120)
    frames = [make_frame(rng, size=256, n_cells=8) for _ in range(2)]
    # stripe the seg channel: 3-on/1-off vertical stripes survive the binary
    # opening and give 64 runs/row in the striped band — far over rcap=8
    stripes = (np.arange(256) % 4 < 3).astype(np.float32)[None, :] * 1000.0
    segs_np = np.stack([f[..., 2] for f in frames]).astype(np.float32)
    segs_np[0, :128] += stripes
    segs = jnp.asarray(segs_np)
    greens = jnp.asarray(np.stack([f[..., 1] for f in frames]).astype(np.float32))

    kw = dict(chunk=8, cell_capacity=32, rcap=8)
    ref, ref_stats = score_frames_fused(model, params, segs, greens, threshold_segment, **kw)
    got, got_stats = score_frames_fused(
        model, params, segs, greens, _threshold_mask_fn,
        fallback_segment_fn=threshold_segment, **kw,
    )
    np.testing.assert_array_equal(got_stats["label_ids"], ref_stats["label_ids"])
    for k in ref:
        if k.endswith("_rate"):
            assert got[k] == ref[k], k
        else:
            np.testing.assert_allclose(got[k], ref[k], atol=1e-5, err_msg=k)


@pytest.mark.slow
def test_score_frames_fused_empty(rng):
    model, params, _, _ = _fitted_params(rng, n_train=120)
    segs = jnp.zeros((2, 256, 256), jnp.float32)
    greens = jnp.zeros((2, 256, 256), jnp.float32)
    scores, stats = score_frames_fused(model, params, segs, greens,
                                       threshold_segment, chunk=8, cell_capacity=32)
    assert scores == {} and len(stats["area"]) == 0


def test_score_frames_fused_start_wait_pipelined(rng):
    # two batches dispatched before either is waited on (the production
    # pipelining pattern in pipeline/screening.py and utils/bench.py) must
    # reproduce the sequential results exactly, in order
    from cell_image_analysis_tpu.pipeline.scoring import (
        score_frames_fused_start,
        score_frames_fused_wait,
    )

    model, params, _, _ = _fitted_params(rng, n_train=120)
    frames = [make_frame(rng, size=256, n_cells=8) for _ in range(4)]
    batches = []
    for i in (0, 2):
        segs = jnp.asarray(np.stack([f[..., 2] for f in frames[i : i + 2]]).astype(np.float32))
        greens = jnp.asarray(np.stack([f[..., 1] for f in frames[i : i + 2]]).astype(np.float32))
        batches.append((segs, greens))

    kw = dict(chunk=8, cell_capacity=32)
    refs = [score_frames_fused(model, params, s, g, threshold_segment, **kw)
            for s, g in batches]

    pends = [score_frames_fused_start(model, params, s, g, threshold_segment, **kw)
             for s, g in batches]
    gots = [score_frames_fused_wait(p) for p in pends]

    for (ref, ref_stats), (got, got_stats) in zip(refs, gots):
        assert len(got_stats["area"]) == len(ref_stats["area"]) > 0
        np.testing.assert_array_equal(got_stats["area"], ref_stats["area"])
        for k in ref:
            if k.endswith("_rate"):
                assert got[k] == ref[k], k
            else:
                np.testing.assert_array_equal(got[k], ref[k], err_msg=k)
