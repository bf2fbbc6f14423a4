"""MXU regionprops implementation must equal the scatter implementation."""

import numpy as np
import jax.numpy as jnp

from cell_image_analysis_tpu.ops.cc import label_components
from cell_image_analysis_tpu.ops.regionprops import regionprops
from tests.test_regionprops_cc import _blob_image


def test_regionprops_mxu_matches_scatter(rng):
    mask = _blob_image(rng)
    labels, _ = label_components(jnp.asarray(mask))
    a = regionprops(labels, capacity=64, impl="scatter")
    b = regionprops(labels, capacity=64, impl="mxu")
    np.testing.assert_array_equal(np.asarray(a.area), np.asarray(b.area))
    np.testing.assert_array_equal(np.asarray(a.min_r), np.asarray(b.min_r))
    np.testing.assert_array_equal(np.asarray(a.min_c), np.asarray(b.min_c))
    np.testing.assert_array_equal(np.asarray(a.max_r), np.asarray(b.max_r))
    np.testing.assert_array_equal(np.asarray(a.max_c), np.asarray(b.max_c))
    np.testing.assert_allclose(np.asarray(a.centroid_r), np.asarray(b.centroid_r), atol=1e-4)
    np.testing.assert_allclose(np.asarray(a.eccentricity), np.asarray(b.eccentricity), atol=1e-4)
    np.testing.assert_array_equal(np.asarray(a.valid), np.asarray(b.valid))
