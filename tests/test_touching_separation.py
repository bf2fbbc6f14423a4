"""StarDist's reason to exist: separating TOUCHING instances that
threshold+CC segmentation provably merges (the reference uses pretrained
StarDist exactly for crowded fluorescence plates —
/root/reference/improved_detection.py:44-63).

Runs the bundled artifact against a generator-labeled crowded frame
(utils/synthetic.make_frame_instances) and checks the star-polygon path
splits touching packs that connected components cannot.  Skipped when the
bundled weights predate the dense-training regime (meta['dense'] False) —
sparse-trained weights never saw touching cells."""

import os
import pickle

import numpy as np
import pytest

ASSETS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "assets", "unet_synthetic.pkl")


def _meta():
    with open(ASSETS, "rb") as f:
        return pickle.load(f).get("meta", {})


@pytest.mark.slow
def test_stardist_separates_touching_threshold_merges():
    if not _meta().get("dense"):
        pytest.skip("bundled weights not dense-trained")
    import jax.numpy as jnp
    from scipy import ndimage as ndi

    from cell_image_analysis_tpu.config import SegConfig
    from cell_image_analysis_tpu.models.stardist import predict_instances
    from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables
    from cell_image_analysis_tpu.utils.synthetic import make_frame_instances

    rng = np.random.default_rng(21)
    frame, lab_true = make_frame_instances(rng, size=384, n_cells=14,
                                           clustering=0.8)
    seg = frame[..., 2].astype(np.float64)
    n_true = len(np.unique(lab_true)) - 1

    # the classical threshold+CC oracle merges touching packs
    lo, hi = np.percentile(seg, 3), np.percentile(seg, 99.8)
    norm = (seg - lo) / (hi - lo + 1e-20)
    mask = ndi.binary_opening(norm > np.percentile(norm, 90.0))
    _, n_cc = ndi.label(mask)
    assert n_cc < n_true, (n_cc, n_true)  # the workload really does touch

    variables = load_synthetic_unet_variables()
    cfg = SegConfig(max_candidates=256, raster_patch=96)
    labels, details = predict_instances(
        jnp.asarray(seg.astype(np.float32)), variables, cfg)
    labels = np.asarray(labels)
    n_pred = len(np.unique(labels)) - 1

    # star-polygon NMS must recover strictly more instances than CC and get
    # within 2 of the generator truth
    assert n_pred > n_cc, (n_pred, n_cc)
    assert abs(n_pred - n_true) <= 2, (n_pred, n_true)

    # instance agreement: majority of true fg is covered and matched 1-1
    # (each true cell's dominant predicted label is unique)
    cover = ((labels > 0) & (lab_true > 0)).sum() / max((lab_true > 0).sum(), 1)
    assert cover > 0.6, cover
    dom = []
    for k in np.unique(lab_true)[1:]:
        m = lab_true == k
        vals, counts = np.unique(labels[m][labels[m] > 0], return_counts=True)
        if len(vals):
            dom.append(int(vals[np.argmax(counts)]))
    assert len(dom) >= n_true - 2
    assert len(set(dom)) >= len(dom) - 1  # at most one merged pair
