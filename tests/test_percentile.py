"""Percentile / normalization kernels vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from cell_image_analysis_tpu.ops.percentile import (
    masked_percentile,
    median_iqr,
    normalize_percentile,
    percentile,
)


def test_percentile_matches_numpy_flat(rng):
    x = rng.normal(size=(257, 133)).astype(np.float32)
    for q in [0.0, 3.0, 25.0, 50.0, 75.0, 95.0, 99.8, 100.0]:
        ours = float(percentile(jnp.asarray(x), q))
        ref = float(np.percentile(x, q))
        assert abs(ours - ref) < 1e-5, (q, ours, ref)


def test_percentile_matches_numpy_axis(rng):
    x = rng.normal(size=(101, 17)).astype(np.float32)
    ours = np.asarray(percentile(jnp.asarray(x), np.array([25.0, 50.0, 75.0]), axis=0))
    ref = np.percentile(x, [25, 50, 75], axis=0)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_normalize_percentile_matches_csbdeep_semantics(rng):
    # csbdeep.utils.normalize: (x - p3) / (p99.8 - p3 + 1e-20), float32, no clip.
    x = (rng.uniform(size=(256, 256)) * 4000).astype(np.uint16)
    ours = np.asarray(normalize_percentile(jnp.asarray(x)))
    lo, hi = np.percentile(x, 3), np.percentile(x, 99.8)
    ref = ((x - lo) / (hi - lo + 1e-20)).astype(np.float32)
    assert ours.dtype == np.float32
    np.testing.assert_allclose(ours, ref, atol=1e-4)
    # no clipping: values outside [0,1] survive
    assert ours.min() < 0 or ours.max() > 1


def test_median_iqr_matches_numpy(rng):
    x = rng.normal(size=(301, 64)).astype(np.float32)
    med, iqr = median_iqr(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(med), np.median(x, axis=0), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(iqr),
        np.percentile(x, 75, axis=0) - np.percentile(x, 25, axis=0),
        atol=1e-5,
    )


def test_masked_percentile(rng):
    x = rng.normal(size=(64,)).astype(np.float32)
    mask = rng.uniform(size=(64,)) > 0.4
    ref = np.percentile(x[mask], 95)
    ours = float(masked_percentile(jnp.asarray(x), jnp.asarray(mask), 95.0))
    assert abs(ours - ref) < 1e-5


def test_percentile_select_matches_sorted_order_stats(rng):
    from cell_image_analysis_tpu.ops.percentile import (
        kth_smallest,
        percentile_ranks,
        percentile_select,
    )

    for n in (999, 4096, 65536):
        x = (rng.normal(scale=500, size=n)).astype(np.float32)
        xs = np.sort(x)
        # selection returns exact order statistics
        ks = (0, 7, n // 2, n - 2, n - 1)
        vals = np.asarray(kth_smallest(jnp.asarray(x), ks))
        np.testing.assert_array_equal(vals, xs[list(ks)])
        # percentile_select = numpy-f64 index arithmetic + f32 lerp of
        # the exact order statistics
        qs = (3.0, 50.0, 90.0, 99.8)
        got = np.asarray(percentile_select(jnp.asarray(x), qs))
        ref = []
        for q, (k_lo, k_hi, frac) in zip(qs, percentile_ranks(n, qs)):
            ref.append(xs[k_lo] * (np.float32(1.0) - frac) + xs[k_hi] * frac)
        # 1-ulp tolerance: XLA may contract the lerp into an FMA (single
        # rounding), which numpy's two-rounding sequence can't reproduce
        np.testing.assert_allclose(got, np.array(ref, np.float32), rtol=1.5e-7)
        np.testing.assert_allclose(got, np.percentile(x, list(qs)), rtol=2e-6)


def test_threshold_mask_matches_numpy_reference(rng):
    # sort-free threshold_mask == the straightforward numpy construction
    # (normalize with f32-lerped f64-rank percentiles, then threshold at the
    # transformed raw-order-statistic percentile)
    from cell_image_analysis_tpu.models.segmentation import binary_opening, threshold_mask
    from cell_image_analysis_tpu.ops.percentile import percentile_ranks

    x = (rng.uniform(0, 3000, size=(257, 129))).astype(np.float32)
    got = np.asarray(threshold_mask(jnp.asarray(x)))

    xs = np.sort(x.reshape(-1))
    rk = percentile_ranks(x.size, (3.0, 99.8, 90.0))
    lerp = lambda i: np.float32(
        xs[rk[i][0]] * (np.float32(1.0) - rk[i][2]) + xs[rk[i][1]] * rk[i][2]
    )
    lo, hi = lerp(0), lerp(1)
    scale = np.float32(hi - lo + 1e-20)
    norm = (x - lo) / scale
    g = lambda v: np.float32((v - lo) / scale)
    thresh = np.float32(
        g(xs[rk[2][0]]) * (np.float32(1.0) - rk[2][2]) + g(xs[rk[2][1]]) * rk[2][2]
    )
    ref = np.asarray(binary_opening(jnp.asarray(norm > thresh)))
    np.testing.assert_array_equal(got, ref)
