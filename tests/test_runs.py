"""Run-length CC + regionprops (ops/runs.py) vs scipy and the pixel path."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage as ndi

from cell_image_analysis_tpu.ops.cc import label_components
from cell_image_analysis_tpu.ops.regionprops import regionprops
from cell_image_analysis_tpu.ops.runs import (
    cc_runs,
    labels_from_mask,
    regionprops_from_mask,
    run_table,
)


def _blob_image(rng, h=256, w=256, n=12, rmin=6, rmax=20):
    mask = np.zeros((h, w), bool)
    yy, xx = np.mgrid[0:h, 0:w]
    for _ in range(n):
        cy, cx = rng.integers(rmax, h - rmax), rng.integers(rmax, w - rmax)
        r = rng.integers(rmin, rmax)
        mask |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
    return mask


def _run_table_np(mask, rcap):
    h, w = mask.shape
    start = np.full((h, rcap), w, np.int32)
    end = np.zeros((h, rcap), np.int32)
    overflow = False
    for r in range(h):
        j = 0
        c = 0
        while c < w:
            if mask[r, c]:
                s = c
                while c < w and mask[r, c]:
                    c += 1
                if j < rcap:
                    start[r, j] = s
                    end[r, j] = c
                else:
                    overflow = True
                j += 1
            else:
                c += 1
    return start, end, overflow


def test_run_table_matches_numpy(rng):
    mask = rng.random((64, 96)) < 0.4
    ref_s, ref_e, ref_ov = _run_table_np(mask, 32)
    for impl in ("scatter", "topk"):
        t = run_table(jnp.asarray(mask), rcap=32, impl=impl)
        np.testing.assert_array_equal(np.asarray(t.start), ref_s, err_msg=impl)
        np.testing.assert_array_equal(np.asarray(t.end), ref_e, err_msg=impl)
        assert bool(t.overflow) == ref_ov


def test_run_table_overflow_flag(rng):
    mask = np.zeros((8, 64), bool)
    mask[3, ::2] = True  # 32 single-pixel runs
    assert not bool(run_table(jnp.asarray(mask), rcap=32).overflow)
    assert bool(run_table(jnp.asarray(mask), rcap=16).overflow)


def test_labels_from_mask_matches_scipy(rng):
    for conn, structure in (
        (1, None),
        (2, np.ones((3, 3), bool)),
    ):
        for _ in range(3):
            mask = _blob_image(rng)
            got, count, ov = labels_from_mask(jnp.asarray(mask), rcap=64, connectivity=conn)
            assert not bool(ov)
            ref, ref_count = ndi.label(mask, structure=structure)
            assert int(count) == ref_count
            np.testing.assert_array_equal(np.asarray(got), ref)


def test_labels_from_mask_noise_and_serpentine(rng):
    # dense random noise exercises many runs/row and heavy merging
    mask = np.asarray(rng.random((128, 128)) < 0.55)
    got, count, ov = labels_from_mask(jnp.asarray(mask), rcap=64, connectivity=1)
    assert not bool(ov)
    ref, ref_count = ndi.label(mask)
    assert int(count) == ref_count
    np.testing.assert_array_equal(np.asarray(got), ref)

    # serpentine: long geodesics through thin structures (the hook+jump
    # convergence worst case)
    mask = np.zeros((128, 128), bool)
    for i, r in enumerate(range(4, 124, 8)):
        mask[r, 4:124] = True
        if i % 2 == 0:
            mask[r : r + 9, 123] = True
        else:
            mask[r : r + 9, 4] = True
    got, count, ov = labels_from_mask(jnp.asarray(mask), rcap=64, connectivity=1)
    ref, ref_count = ndi.label(mask)
    assert int(count) == ref_count == 1
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_labels_from_mask_conn2_full_width_rows(rng):
    # Regression: at connectivity=2 the invalid-slot sentinel (start=W,
    # end=0) passes the touch test against a full-width run, which let an
    # invalid slot acquire a parent and relay labels across an
    # all-background row — merging two separate full-width components.
    mask = np.zeros((5, 32), bool)
    mask[1, :] = True
    mask[3, :] = True
    got, count, ov = labels_from_mask(jnp.asarray(mask), rcap=8, connectivity=2)
    assert not bool(ov)
    ref, ref_count = ndi.label(mask, structure=np.ones((3, 3), bool))
    assert int(count) == ref_count == 2
    np.testing.assert_array_equal(np.asarray(got), ref)

    # same shape but with random partial rows mixed in
    mask = np.asarray(rng.random((64, 64)) < 0.45)
    mask[10, :] = True
    mask[12, :] = True
    mask[11, :] = False
    got, count, ov = labels_from_mask(jnp.asarray(mask), rcap=64, connectivity=2)
    assert not bool(ov)
    ref, ref_count = ndi.label(mask, structure=np.ones((3, 3), bool))
    assert int(count) == ref_count
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_cc_runs_no_jump_agrees(rng):
    mask = _blob_image(rng, h=128, w=128, n=8)
    t = run_table(jnp.asarray(mask), rcap=64)
    np.testing.assert_array_equal(
        np.asarray(cc_runs(t, jump=True)), np.asarray(cc_runs(t, jump=False))
    )


def test_regionprops_from_mask_matches_pixel_path(rng):
    mask = _blob_image(rng)
    labels, count = label_components(jnp.asarray(mask), connectivity=1)
    ref = regionprops(labels, capacity=64)
    got, ov = regionprops_from_mask(jnp.asarray(mask), capacity=64, rcap=64)
    assert not bool(ov)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(got.area), np.asarray(ref.area))
    for f in ("min_r", "min_c", "max_r", "max_c"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), err_msg=f
        )
    v = np.asarray(ref.valid)
    for f in ("centroid_r", "centroid_c", "eccentricity"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, f))[v], np.asarray(getattr(ref, f))[v],
            atol=1e-4, err_msg=f,
        )


def test_regionprops_from_labels_matches_pixel_path(rng):
    from cell_image_analysis_tpu.ops.runs import regionprops_from_labels

    # label map with ids NOT in raster order (the StarDist rasterizer
    # numbers by descending probability)
    mask = _blob_image(rng)
    labels, count = label_components(jnp.asarray(mask), connectivity=1)
    perm = np.concatenate([[0], 1 + rng.permutation(64)])
    labels = jnp.asarray(perm[np.asarray(labels)].astype(np.int32))

    ref = regionprops(labels, capacity=64)
    got, ov = regionprops_from_labels(labels, capacity=64, rcap=64)
    assert not bool(ov)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    np.testing.assert_array_equal(np.asarray(got.area), np.asarray(ref.area))
    for f in ("min_r", "min_c", "max_r", "max_c"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got, f)), np.asarray(getattr(ref, f)), err_msg=f
        )
    v = np.asarray(ref.valid)
    for f in ("centroid_r", "centroid_c", "eccentricity"):
        np.testing.assert_allclose(
            np.asarray(getattr(got, f))[v], np.asarray(getattr(ref, f))[v],
            atol=1e-4, err_msg=f,
        )

    # adjacent different-label runs (touching instances) must split runs
    lab2 = np.zeros((16, 32), np.int32)
    lab2[4:8, 2:10] = 3
    lab2[4:8, 10:20] = 1   # touches label 3 with no gap
    lab2[10:12, 5:25] = 2
    got2, ov2 = regionprops_from_labels(jnp.asarray(lab2), capacity=8, rcap=8)
    ref2 = regionprops(jnp.asarray(lab2), capacity=8)
    assert not bool(ov2)
    np.testing.assert_array_equal(np.asarray(got2.area), np.asarray(ref2.area))
    for f in ("min_r", "min_c", "max_r", "max_c"):
        np.testing.assert_array_equal(
            np.asarray(getattr(got2, f)), np.asarray(getattr(ref2, f)), err_msg=f
        )


def test_regionprops_from_mask_capacity_dump(rng):
    # labels beyond capacity are dumped, same as the pixel path
    mask = np.zeros((64, 64), bool)
    for c in range(0, 64, 8):
        mask[10:20, c : c + 4] = True
    got, ov = regionprops_from_mask(jnp.asarray(mask), capacity=4, rcap=16)
    assert not bool(ov)
    assert np.asarray(got.valid).sum() == 4
    assert int(got.area[0]) == 40
