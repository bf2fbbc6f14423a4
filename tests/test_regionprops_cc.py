"""Device regionprops / connected components vs scipy + numpy oracles."""

import pytest
import numpy as np
import jax.numpy as jnp
from scipy import ndimage as ndi

from cell_image_analysis_tpu.ops.cc import label_components
from cell_image_analysis_tpu.ops.oracle.regionprops_np import regionprops_np
from cell_image_analysis_tpu.ops.regionprops import qc_mask, regionprops


def _blob_image(rng, h=256, w=256, n=12, rmin=6, rmax=20):
    """Random disks -> boolean mask (possibly merging)."""
    mask = np.zeros((h, w), bool)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n):
        cy, cx = rng.integers(rmax, h - rmax), rng.integers(rmax, w - rmax)
        r = rng.integers(rmin, rmax)
        mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    return mask


def test_label_components_matches_scipy(rng):
    mask = _blob_image(rng)
    ours, count = label_components(jnp.asarray(mask), connectivity=1)
    ours = np.asarray(ours)
    ref, ref_count = ndi.label(mask)
    assert int(count) == ref_count
    # identical partitions AND identical numbering (raster order of first pixel)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.slow
def test_label_components_impls_agree(rng):
    # the scan (run-min) and sweep (min-propagation) bodies reach the same
    # fixpoint, incl. serpentine components that need many passes
    mask = _blob_image(rng)
    mask[5, 5:120] = True  # long thin runs with bends
    mask[5:120, 119] = True
    mask[119, 40:120] = True
    counts = {}
    for conn in (1, 2):
        ref, cref = label_components(jnp.asarray(mask), connectivity=conn, impl="sweeps")
        for impl in ("scan", "pallas", "hier"):
            got, cgot = label_components(jnp.asarray(mask), connectivity=conn, impl=impl)
            assert int(cgot) == int(cref), impl
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref), err_msg=impl)
        counts[conn] = int(cref)
    ref, ref_count = ndi.label(mask)  # scipy default structure = 4-connectivity
    assert counts[1] == ref_count


def test_label_components_8conn(rng):
    mask = np.zeros((16, 16), bool)
    mask[2, 2] = mask[3, 3] = True  # diagonal touch
    ours4, c4 = label_components(jnp.asarray(mask), connectivity=1)
    ours8, c8 = label_components(jnp.asarray(mask), connectivity=2)
    assert int(c4) == 2 and int(c8) == 1


def test_regionprops_matches_numpy_oracle(rng):
    mask = _blob_image(rng)
    labels, count = label_components(jnp.asarray(mask))
    intensity = rng.uniform(size=mask.shape).astype(np.float32)
    props = regionprops(labels, capacity=64)
    ref = regionprops_np(np.asarray(labels), intensity)
    assert len(ref) == int(count)
    for r in ref:
        i = r["label"] - 1
        assert bool(props.valid[i])
        assert int(props.area[i]) == r["area"]
        assert (
            int(props.min_r[i]),
            int(props.min_c[i]),
            int(props.max_r[i]),
            int(props.max_c[i]),
        ) == r["bbox"]
        np.testing.assert_allclose(
            [float(props.centroid_r[i]), float(props.centroid_c[i])],
            r["centroid"],
            atol=1e-4,
        )
        np.testing.assert_allclose(float(props.eccentricity[i]), r["eccentricity"], atol=1e-4)
    # capacity slots beyond count are invalid
    assert not np.asarray(props.valid)[int(count):].any()


def test_qc_mask_gates(rng):
    # hand-built label map: one good cell, one touching the border, one too
    # small, one too eccentric (thin bar)
    labels = np.zeros((128, 128), np.int32)
    yy, xx = np.mgrid[0:128, 0:128]
    labels[(yy - 64) ** 2 + (xx - 64) ** 2 <= 18 ** 2] = 1          # good, area ~1000
    labels[(yy - 5) ** 2 + (xx - 40) ** 2 <= 12 ** 2] = 2           # border violation
    labels[(yy - 100) ** 2 + (xx - 100) ** 2 <= 3 ** 2] = 3         # too small
    labels[30:32, 20:110] = 4                                       # thin bar, ecc ~1
    props = regionprops(jnp.asarray(labels), capacity=8)
    m = np.asarray(qc_mask(props, jnp.int32(128), jnp.int32(128)))
    assert m[0] and not m[1] and not m[2] and not m[3]
    assert not m[4:].any()
