"""Tests for the instance-labeled dense-frame generator
(utils/synthetic.make_frame_instances) — the training data for the
realistic-weights regime (crowded/touching plates, as the reference's
pretrained `2D_versatile_fluo` sees: CAE_improved_modeltrain.py:118)."""

import numpy as np

from cell_image_analysis_tpu.utils.synthetic import make_frame_instances


def test_labels_cover_bright_cells():
    rng = np.random.default_rng(3)
    f, lab = make_frame_instances(rng, size=384, n_cells=15)
    assert f.shape == (384, 384, 3) and f.dtype == np.uint16
    assert lab.shape == (384, 384) and lab.dtype == np.int32
    assert 1 <= lab.max() <= 15
    seg = f[..., 2].astype(np.float64)
    # labeled pixels are bright vs background
    assert seg[lab > 0].mean() > 2.5 * seg[lab == 0].mean()
    # each instance footprint is a plausible cell area (QC gates 200-8000,
    # minus what occlusion by a neighbour removes)
    for k in range(1, int(lab.max()) + 1):
        a = int((lab == k).sum())
        assert a == 0 or 80 <= a <= 8000, (k, a)


def test_clustering_produces_touching_instances():
    rng = np.random.default_rng(4)
    _, lab = make_frame_instances(rng, size=512, n_cells=40, clustering=0.9)
    a, b = lab[:-1, :], lab[1:, :]
    touch_v = int(((a != b) & (a > 0) & (b > 0)).sum())
    a, b = lab[:, :-1], lab[:, 1:]
    touch_h = int(((a != b) & (a > 0) & (b > 0)).sum())
    # crowded plates must contain distinct instances sharing a boundary —
    # the case threshold+CC segmentation provably merges
    assert touch_v + touch_h > 50


def test_deterministic_given_seed():
    f1, l1 = make_frame_instances(np.random.default_rng(7), size=256, n_cells=10)
    f2, l2 = make_frame_instances(np.random.default_rng(7), size=256, n_cells=10)
    np.testing.assert_array_equal(f1, f2)
    np.testing.assert_array_equal(l1, l2)


def test_ownership_is_nearest_cell():
    """Contested pixels go to the cell with the smallest normalized d2 —
    no instance may claim pixels strictly inside another's core."""
    rng = np.random.default_rng(5)
    _, lab = make_frame_instances(rng, size=384, n_cells=25, clustering=0.8)
    # core pixels (high label density centroid region) stay single-labeled:
    # a proxy check — every 8-connected clump of one label is contiguous
    from scipy import ndimage as ndi

    for k in range(1, int(lab.max()) + 1):
        m = lab == k
        if m.sum() == 0:
            continue
        _, n_comp = ndi.label(m, structure=np.ones((3, 3)))
        assert n_comp <= 2, (k, n_comp)  # occlusion may split once, rarely
