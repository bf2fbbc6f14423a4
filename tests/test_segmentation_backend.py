"""Threshold segmentation backend: opening vs scipy, denoised labeling."""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage as ndi

from cell_image_analysis_tpu.models.segmentation import binary_opening, threshold_segment
from cell_image_analysis_tpu.utils.synthetic import make_frame


def test_binary_opening_matches_scipy(rng):
    mask = rng.uniform(size=(128, 128)) > 0.6
    ours = np.asarray(binary_opening(jnp.asarray(mask)))
    ref = ndi.binary_opening(mask)  # default cross structure, border 0
    np.testing.assert_array_equal(ours, ref)


def test_threshold_segment_denoises(rng):
    frame = make_frame(rng, size=512, n_cells=20, noise=12.0)
    seg = jnp.asarray(frame[..., 2].astype(np.float32))
    noisy = threshold_segment(seg, opening=False)
    clean = threshold_segment(seg, opening=True)
    # opening removes speckle components by orders of magnitude
    assert int(clean.max()) < int(noisy.max())
    assert int(clean.max()) < 200
