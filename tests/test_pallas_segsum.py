"""Pallas segment-sum kernel vs jax.ops.segment_sum (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.ops.pallas.segsum import segment_sums_pallas


def test_segment_sums_pallas_matches_reference(rng):
    P, F, n_seg = 3000, 3, 300
    seg = rng.integers(0, n_seg, P).astype(np.int32)
    data = rng.normal(size=(P, F)).astype(np.float32)
    ref = np.asarray(jax.ops.segment_sum(jnp.asarray(data), jnp.asarray(seg),
                                         num_segments=n_seg))
    out = np.asarray(segment_sums_pallas(jnp.asarray(seg), jnp.asarray(data), n_seg))
    np.testing.assert_allclose(out, ref, atol=1e-3)


def test_segment_sums_pallas_drops_out_of_range(rng):
    P, F, n_seg = 1024, 2, 64
    seg = rng.integers(0, n_seg, P).astype(np.int32)
    seg[::10] = n_seg + 5  # out of range -> dropped
    data = np.ones((P, F), np.float32)
    out = np.asarray(segment_sums_pallas(jnp.asarray(seg), jnp.asarray(data), n_seg))
    assert out.sum() == (seg < n_seg).sum() * F
