"""Batched multi-frame extraction equals per-frame extraction."""

import pytest
import numpy as np
import jax.numpy as jnp

from cell_image_analysis_tpu.models.segmentation import threshold_segment
from cell_image_analysis_tpu.ops.extract import extract_cells_chunked, extract_cells_frames
from cell_image_analysis_tpu.utils.synthetic import make_frame


@pytest.mark.slow
def test_batched_frames_equal_per_frame(rng):
    frames = [make_frame(rng, size=256, n_cells=8) for _ in range(3)]
    segs = jnp.asarray(np.stack([f[..., 2] for f in frames]).astype(np.float32))
    greens = jnp.asarray(np.stack([f[..., 1] for f in frames]).astype(np.float32))

    batch_cells, batch_stats = extract_cells_frames(
        segs, greens, threshold_segment, chunk=8, cell_capacity=32
    )

    per_cells, per_frames = [], []
    for f in frames:
        labels = threshold_segment(jnp.asarray(f[..., 2].astype(np.float32)))
        c, st = extract_cells_chunked(
            labels, jnp.asarray(f[..., 1].astype(np.float32)), chunk=8, cell_capacity=32
        )
        per_cells.append(c)
        per_frames.extend([len(per_frames) and per_frames[-1]] * 0)  # no-op
    ref = np.concatenate(per_cells, axis=0)

    assert len(batch_cells) == len(ref)
    np.testing.assert_allclose(batch_cells, ref, atol=1e-5)
    # frame_index bookkeeping
    counts = [len(c) for c in per_cells]
    expect = np.repeat(np.arange(3), counts)
    np.testing.assert_array_equal(batch_stats["frame_index"], expect)
