"""Frame -> batched cells extraction graph vs a host reference path."""

import numpy as np
import jax.numpy as jnp

from cell_image_analysis_tpu.models.segmentation import threshold_segment
from cell_image_analysis_tpu.ops.extract import extract_cells
from cell_image_analysis_tpu.ops.oracle.clahe_np import equalize_adapthist_np
from cell_image_analysis_tpu.ops.oracle.regionprops_np import regionprops_np
from cell_image_analysis_tpu.utils.synthetic import make_frame


def _host_reference_cells(labels, green, qc=dict(border=10, amin=200, amax=8000, emax=0.95,
                                                 mmin=0.5, smin=0.1)):
    """The reference extract_quality_cells loop, re-expressed with our oracles."""
    from tests.test_resize import skimage_resize_oracle

    h, w = labels.shape
    cells, stats = [], []
    for p in regionprops_np(labels, green):
        minr, minc, maxr, maxc = p["bbox"]
        if minr < qc["border"] or minc < qc["border"] or maxr > h - qc["border"] or maxc > w - qc["border"]:
            continue
        if p["area"] < qc["amin"] or p["area"] > qc["amax"]:
            continue
        if p["eccentricity"] > qc["emax"]:
            continue
        crop = green[minr:maxr, minc:maxc].astype(np.float64)
        if crop.mean() < qc["mmin"] or crop.std() < qc["smin"]:
            continue
        eq = equalize_adapthist_np(crop, clip_limit=0.02)
        cells.append(skimage_resize_oracle(eq, 64))
        stats.append(p)
    return cells, stats


def test_extract_matches_host_reference(rng):
    frame = make_frame(rng, size=384, n_cells=14)
    seg = jnp.asarray(frame[..., 2].astype(np.float32))
    green = frame[..., 1].astype(np.float32)
    labels = np.asarray(threshold_segment(seg))

    ref_cells, ref_stats = _host_reference_cells(labels, green)
    assert len(ref_cells) >= 5, "synthetic frame should yield several QC cells"

    out = extract_cells(jnp.asarray(labels), jnp.asarray(green), cell_capacity=64)
    valid = np.asarray(out.valid)
    got = np.asarray(out.cells)[valid]
    assert len(got) == len(ref_cells)

    # same order (ascending label id), same stats, same tensors
    for i, (cell, st) in enumerate(zip(ref_cells, ref_stats)):
        np.testing.assert_allclose(got[i], cell, atol=5e-4, err_msg=f"cell {i}")
    areas = np.asarray(out.area)[valid]
    np.testing.assert_array_equal(areas, [s["area"] for s in ref_stats])
    means = np.asarray(out.mean_intensity)[valid]
    np.testing.assert_allclose(means, [s["mean_intensity_bbox"] for s in ref_stats], rtol=1e-5)
    stds = np.asarray(out.std_intensity)[valid]
    np.testing.assert_allclose(stds, [s["std_intensity_bbox"] for s in ref_stats], rtol=1e-4)


def test_extract_respects_intensity_gates(rng):
    # a dark frame: every region fails the mean >= 0.5 gate
    labels = np.zeros((128, 128), np.int32)
    yy, xx = np.mgrid[0:128, 0:128]
    labels[(yy - 64) ** 2 + (xx - 64) ** 2 <= 15 ** 2] = 1
    green = np.full((128, 128), 0.2, np.float32)
    out = extract_cells(jnp.asarray(labels), jnp.asarray(green), cell_capacity=16)
    assert not np.asarray(out.valid).any()
    assert int(out.n_candidates) == 1  # passed geometry, failed intensity


def test_extract_empty_frame(rng):
    labels = np.zeros((128, 128), np.int32)
    green = np.zeros((128, 128), np.float32)
    out = extract_cells(jnp.asarray(labels), jnp.asarray(green), cell_capacity=16)
    assert not np.asarray(out.valid).any()
    assert int(out.n_candidates) == 0
