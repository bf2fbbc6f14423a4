"""Chunked extraction path must equal the single-graph reference path."""

import numpy as np
import jax.numpy as jnp

from cell_image_analysis_tpu.models.segmentation import threshold_segment
from cell_image_analysis_tpu.ops.extract import (
    extract_candidates,
    extract_cells,
    extract_cells_chunked,
)
from cell_image_analysis_tpu.utils.synthetic import make_frame


def test_chunked_equals_single_graph(rng):
    frame = make_frame(rng, size=384, n_cells=16)
    labels = threshold_segment(jnp.asarray(frame[..., 2].astype(np.float32)))
    green = jnp.asarray(frame[..., 1].astype(np.float32))

    ref = extract_cells(labels, green, cell_capacity=64)
    valid = np.asarray(ref.valid)
    ref_cells = np.asarray(ref.cells)[valid]

    cells, stats = extract_cells_chunked(labels, green, chunk=8, cell_capacity=64)
    assert len(cells) == valid.sum()
    np.testing.assert_allclose(cells, ref_cells, atol=1e-5)
    np.testing.assert_array_equal(stats["area"], np.asarray(ref.area)[valid])
    np.testing.assert_array_equal(stats["label_ids"], np.asarray(ref.label_ids)[valid])
    np.testing.assert_allclose(stats["mean_intensity"], np.asarray(ref.mean_intensity)[valid], rtol=1e-6)


def test_chunked_small_cap_bucket(rng):
    # all synthetic cells fit in the small bucket; result must be identical
    frame = make_frame(rng, size=384, n_cells=10)
    labels = threshold_segment(jnp.asarray(frame[..., 2].astype(np.float32)))
    green = jnp.asarray(frame[..., 1].astype(np.float32))
    big, _ = extract_cells_chunked(labels, green, chunk=128, small_cap=1, cell_capacity=64)
    small, _ = extract_cells_chunked(labels, green, chunk=128, small_cap=96, cell_capacity=64)
    np.testing.assert_allclose(small, big, atol=1e-5)


def test_candidates_packing(rng):
    frame = make_frame(rng, size=384, n_cells=16)
    labels = threshold_segment(jnp.asarray(frame[..., 2].astype(np.float32)))
    green = jnp.asarray(frame[..., 1].astype(np.float32))
    cand = extract_candidates(labels, green, cell_capacity=64)
    n = int(cand.n_valid)
    v = np.asarray(cand.valid)
    assert v[:n].all() and not v[n:].any()          # packed to the front
    labs = np.asarray(cand.label_ids)[:n]
    assert (np.diff(labs) > 0).all()                # ascending label order
