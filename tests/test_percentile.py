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
