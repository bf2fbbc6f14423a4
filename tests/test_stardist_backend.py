"""StarDist-style backend: U-Net shapes, GT generation, train->segment loop."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy import ndimage as ndi

from cell_image_analysis_tpu.config import SegConfig
from cell_image_analysis_tpu.models.stardist import predict_instances
from cell_image_analysis_tpu.models.unet import init_unet, unet_forward
from cell_image_analysis_tpu.train.unet_trainer import (
    fit_unet,
    prob_gt,
    star_dist_gt,
)


def _disk_labels(size=128, centers=((40, 40, 14), (90, 80, 12))):
    yy, xx = np.mgrid[0:size, 0:size]
    labels = np.zeros((size, size), np.int32)
    for i, (cy, cx, r) in enumerate(centers):
        labels[(yy - cy) ** 2 + (xx - cx) ** 2 <= r * r] = i + 1
    return labels


def test_unet_output_shapes():
    model, variables = init_unet(jax.random.PRNGKey(0), size=128)
    x = jnp.zeros((2, 128, 128, 1), jnp.float32)
    prob, dist = unet_forward(model, variables, x)
    assert prob.shape == (2, 64, 64)        # grid (2,2)
    assert dist.shape == (2, 64, 64, 32)    # 32 rays
    assert float(prob.min()) >= 0 and float(prob.max()) <= 1
    assert float(dist.min()) >= 0           # softplus


def test_star_dist_gt_disk():
    labels = _disk_labels(centers=((64, 64, 20),))
    d = star_dist_gt(labels, n_rays=8)
    # at the center, every ray should reach ~the radius
    center = d[64, 64]
    assert np.all(np.abs(center - 20) <= 2.0), center
    # background has zero distances
    assert d[5, 5].sum() == 0


def test_prob_gt_properties():
    labels = _disk_labels()
    p = prob_gt(labels)
    assert p.max() <= 1.0 and p.min() >= 0.0
    assert p[40, 40] > 0.95      # center of instance 1
    assert p[40, 40 + 13] < 0.3  # near boundary
    assert p[5, 5] == 0.0        # background


@pytest.mark.slow
def test_train_unet_then_predict_instances(rng):
    # overfit one synthetic frame, then the full predict_instances path must
    # recover approximately the right instances on that frame
    size = 128
    lab = np.zeros((size, size), np.int32)
    yy, xx = np.mgrid[0:size, 0:size]
    for j, (cy, cx, r) in enumerate([(40, 40, 14), (85, 60, 13), (55, 100, 12)]):
        m = (yy - cy) ** 2 + (xx - cx) ** 2 <= r * r
        lab[m & (lab == 0)] = j + 1
    img = ((lab > 0) * 1.0 + rng.normal(0, 0.03, (size, size))).astype(np.float32)

    model, variables = fit_unet([img], [lab], epochs=250, lr=3e-3)
    cfg = SegConfig(prob_thresh=0.5, max_candidates=128)
    labels, details = predict_instances(jnp.asarray(img), variables, cfg,
                                        model=model, normalize=False)
    labels = np.asarray(labels)
    n_pred = int(labels.max())
    assert abs(n_pred - 3) <= 2, n_pred
    # predicted instances should cover most of the true foreground
    overlap = ((labels > 0) & (lab > 0)).sum() / max((lab > 0).sum(), 1)
    assert overlap > 0.5, overlap


@pytest.mark.slow
def test_stardist_runs_stage_a_matches_pixel_path(rng):
    """The StarDist backend's run-length label regionprops stage A
    (runs_props=True) produces the same cells and identical decisions as
    the exact pixel path through the fused screening graph."""
    import numpy as np

    from cell_image_analysis_tpu.models.segmentation import StarDistBackend
    from cell_image_analysis_tpu.pipeline.scoring import score_frames_fused
    from cell_image_analysis_tpu.utils.bench import (
        _fit_params,
        load_synthetic_unet_variables,
    )
    from cell_image_analysis_tpu.utils.synthetic import make_frame

    model, params, _ = _fit_params()
    uvars = load_synthetic_unet_variables()
    cfg = SegConfig(max_candidates=128, raster_patch=96, raster_cap=64)
    b_runs = StarDistBackend(uvars, cfg, runs_props=True)
    b_pix = StarDistBackend(uvars, cfg, runs_props=False)
    nprng = np.random.default_rng(3)
    fr = np.stack([make_frame(nprng, size=256, n_cells=5) for _ in range(2)])
    segs = jnp.asarray(fr[..., 2].astype(np.float32))
    greens = jnp.asarray(fr[..., 1].astype(np.float32))
    kw = dict(chunk=16, cell_capacity=32, label_capacity=64)
    s1, st1 = score_frames_fused(model, params, segs, greens, b_runs,
                                 rcap=64, fallback_segment_fn=b_pix, **kw)
    s2, st2 = score_frames_fused(model, params, segs, greens, b_pix, **kw)
    assert len(st1["area"]) == len(st2["area"]) > 0
    np.testing.assert_array_equal(np.sort(st1["area"]), np.sort(st2["area"]))
    np.testing.assert_allclose(np.sort(s1["reconstruction_mse"]),
                               np.sort(s2["reconstruction_mse"]), atol=1e-6)
    for d in ("conservative", "moderate", "ensemble", "fft"):
        assert s1[f"{d}_anomaly_rate"] == s2[f"{d}_anomaly_rate"], d
