"""Tiled (halo-exchanged, 8-device) extraction equals the single-device path.

SURVEY.md section 4: "multi-chip tests via 8-device CPU simulation asserting
sharded anomaly rates equal single-device rates bit-for-bit after psum."
"""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.models.segmentation import threshold_segment
from cell_image_analysis_tpu.ops.extract import extract_cells
from cell_image_analysis_tpu.parallel.mesh import make_mesh
from cell_image_analysis_tpu.parallel.tiling import tiled_extract_cells
from cell_image_analysis_tpu.utils.synthetic import make_frame


@pytest.mark.slow
def test_tiled_extraction_matches_single_device(rng):
    mesh = make_mesh(8)
    frame = make_frame(rng, size=512, n_cells=30, seed=5) if False else make_frame(rng, size=512, n_cells=30)
    seg = jnp.asarray(frame[..., 2].astype(np.float32))
    green = jnp.asarray(frame[..., 1].astype(np.float32))

    # single-device reference
    labels = threshold_segment(seg)
    ref = extract_cells(labels, green, cell_capacity=256)
    rv = np.asarray(ref.valid)
    ref_cells = np.asarray(ref.cells)[rv]
    ref_area = np.sort(np.asarray(ref.area)[rv])

    # tiled: 8 row-tiles of 64 rows, halo 48 (cells are <= ~36 px tall)
    out = tiled_extract_cells(seg, green, mesh, halo=48, cell_capacity=64)
    tv = np.asarray(out.valid)
    tiled_cells = np.asarray(out.cells)[tv]
    tiled_area = np.sort(np.asarray(out.area)[tv])

    assert int(out.n_cells) == rv.sum()
    np.testing.assert_array_equal(tiled_area, ref_area)

    # every tiled cell tensor must match its reference twin exactly
    # (order differs: tiles emit in row-band order)
    ref_by_area = {}
    for i in np.flatnonzero(rv):
        ref_by_area.setdefault(int(np.asarray(ref.area)[i]), []).append(
            np.asarray(ref.cells)[i]
        )
    for j in np.flatnonzero(tv):
        a = int(np.asarray(out.area)[j])
        candidates = ref_by_area.get(a, [])
        errs = [np.abs(c - np.asarray(out.cells)[j]).max() for c in candidates]
        assert errs and min(errs) < 1e-5, f"tiled cell area={a} has no reference twin"


def test_tiled_rates_match(rng):
    # psum-reduced anomaly-equivalent statistic: valid-cell count + mean
    # intensity sums must agree with the single-device path
    mesh = make_mesh(8)
    # sparse cells so every component's extent stays well under the halo
    frame = make_frame(rng, size=512, n_cells=12)
    seg = jnp.asarray(frame[..., 2].astype(np.float32))
    green = jnp.asarray(frame[..., 1].astype(np.float32))
    labels = threshold_segment(seg)
    ref = extract_cells(labels, green, cell_capacity=256)
    rv = np.asarray(ref.valid)
    out = tiled_extract_cells(seg, green, mesh, halo=48, cell_capacity=64)
    tv = np.asarray(out.valid)
    assert int(out.n_cells) == rv.sum()
    np.testing.assert_allclose(
        np.sort(np.asarray(out.mean_intensity)[tv]),
        np.sort(np.asarray(ref.mean_intensity)[rv]),
        rtol=1e-6,
    )
