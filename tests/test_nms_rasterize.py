"""Star-polygon NMS + rasterization vs numpy brute-force oracles."""

import numpy as np
import jax.numpy as jnp

from cell_image_analysis_tpu.ops.nms import (
    overlap_matrix,
    polygon_areas,
    radius_at,
    star_nms,
)
from cell_image_analysis_tpu.ops.rasterize import rasterize_polygons


def _star(rng, cy, cx, r_mean, R=32, wobble=0.2):
    r = r_mean * (1 + rng.uniform(-wobble, wobble, R))
    return np.array([cy, cx], np.float32), r.astype(np.float32)


def _inside_np(pts, center, dists):
    dy = pts[:, 0] - center[0]
    dx = pts[:, 1] - center[1]
    rho = np.sqrt(dy * dy + dx * dx)
    theta = np.arctan2(dy, dx) % (2 * np.pi)
    R = len(dists)
    t = theta / (2 * np.pi) * R
    k0 = np.floor(t).astype(int) % R
    k1 = (k0 + 1) % R
    frac = t - np.floor(t)
    rb = dists[k0] * (1 - frac) + dists[k1] * frac
    return rho <= rb


def _overlap_np(c1, d1, c2, d2, metric="iou", n=400):
    """Dense-grid Monte-Carlo-free overlap oracle."""
    lo = np.minimum(c1 - d1.max(), c2 - d2.max()) - 1
    hi = np.maximum(c1 + d1.max(), c2 + d2.max()) + 1
    ys = np.linspace(lo[0], hi[0], n)
    xs = np.linspace(lo[1], hi[1], n)
    yy, xx = np.meshgrid(ys, xs, indexing="ij")
    pts = np.stack([yy.ravel(), xx.ravel()], 1)
    cell = (ys[1] - ys[0]) * (xs[1] - xs[0])
    in1 = _inside_np(pts, c1, d1)
    in2 = _inside_np(pts, c2, d2)
    inter = (in1 & in2).sum() * cell
    a1, a2 = in1.sum() * cell, in2.sum() * cell
    if metric == "ios":
        return inter / min(a1, a2)
    return inter / (a1 + a2 - inter)


def test_polygon_area_circle():
    # a "circle" star polygon: area -> pi r^2 as R grows (chord polygon is
    # slightly smaller: 0.5 R sin(2pi/R) r^2)
    R, r = 32, 10.0
    d = np.full((1, R), r, np.float32)
    area = float(polygon_areas(jnp.asarray(d))[0])
    expected = 0.5 * R * np.sin(2 * np.pi / R) * r * r
    assert abs(area - expected) < 1e-3


def test_radius_interpolation():
    d = np.array([[1.0, 2.0, 1.0, 2.0]], np.float32)  # R=4
    # halfway between ray 0 (theta=0) and ray 1 (theta=pi/2)
    r = float(radius_at(jnp.asarray(d), jnp.asarray(np.pi / 4))[0])
    assert abs(r - 1.5) < 1e-5


def test_overlap_matrix_matches_oracle(rng):
    c1, d1 = _star(rng, 50, 50, 12)
    c2, d2 = _star(rng, 58, 55, 10)   # overlapping
    c3, d3 = _star(rng, 120, 120, 9)  # disjoint
    centers = jnp.asarray(np.stack([c1, c2, c3]))
    dists = jnp.asarray(np.stack([d1, d2, d3]))
    O = np.asarray(overlap_matrix(centers, dists))
    ref12 = _overlap_np(c1, d1, c2, d2)
    assert abs(O[0, 1] - ref12) < 0.05
    assert abs(O[0, 1] - O[1, 0]) < 0.02  # near-symmetric
    assert O[0, 2] < 0.01 and O[2, 0] < 0.01


def _greedy_nms_np(centers, dists, probs, thresh, metric="iou"):
    order = np.argsort(-probs)
    keep = np.zeros(len(probs), bool)
    for i in order:
        ok = True
        for j in np.flatnonzero(keep):
            if _overlap_np(centers[i], dists[i], centers[j], dists[j], metric) > thresh:
                ok = False
                break
        keep[i] = ok
    return keep


def test_star_nms_matches_greedy_oracle(rng):
    K = 24
    centers, dists, probs = [], [], []
    for _ in range(K):
        c, d = _star(rng, rng.uniform(30, 200), rng.uniform(30, 200), rng.uniform(8, 15))
        centers.append(c)
        dists.append(d)
        probs.append(rng.uniform(0.3, 1.0))
    centers = np.stack(centers).astype(np.float32)
    dists = np.stack(dists).astype(np.float32)
    probs = np.array(probs, np.float32)

    ref = _greedy_nms_np(centers, dists, probs, 0.3)
    ours = np.asarray(star_nms(jnp.asarray(centers), jnp.asarray(dists),
                               jnp.asarray(probs), jnp.ones(K, bool), 0.3))
    # quadrature vs dense-grid overlap may flip decisions sitting exactly at
    # the threshold; demand >= 90% agreement and identical keep counts +-1
    agree = (ref == ours).mean()
    assert agree >= 0.9, (agree, ref, ours)


def test_nms_suppression_chain():
    # A > B overlap; B > C overlap; A,C disjoint => greedy keeps A and C
    R = 32
    d = np.full(R, 10.0, np.float32)
    centers = jnp.asarray(np.array([[50, 50], [50, 62], [50, 74]], np.float32))
    dists = jnp.asarray(np.stack([d, d, d]))
    probs = jnp.asarray(np.array([0.9, 0.8, 0.7], np.float32))
    keep = np.asarray(star_nms(centers, dists, probs, jnp.ones(3, bool), 0.1))
    np.testing.assert_array_equal(keep, [True, False, True])


def test_rasterize_matches_inside_test(rng):
    c1, d1 = _star(rng, 40, 40, 12)
    c2, d2 = _star(rng, 90, 100, 14)
    centers = np.stack([c1, c2]).astype(np.float32)
    dists = np.stack([d1, d2]).astype(np.float32)
    probs = np.array([0.9, 0.8], np.float32)
    labels = np.asarray(rasterize_polygons(
        jnp.asarray(centers), jnp.asarray(dists), jnp.asarray(probs),
        jnp.ones(2, bool), 128, 144))
    assert labels.shape == (128, 144)
    yy, xx = np.mgrid[0:128, 0:144]
    pts = np.stack([yy.ravel(), xx.ravel()], 1).astype(np.float64)
    for k, (c, d) in enumerate([(c1, d1), (c2, d2)]):
        inside = _inside_np(pts, c, d).reshape(128, 144)
        got = labels == (k + 1)
        # pixel-center rasterization parity
        np.testing.assert_array_equal(got, inside)


def test_rasterize_overlap_highest_prob_wins(rng):
    R = 32
    d = np.full((2, R), 10.0, np.float32)
    centers = jnp.asarray(np.array([[50, 50], [50, 58]], np.float32))
    probs = jnp.asarray(np.array([0.5, 0.9], np.float32))
    labels = np.asarray(rasterize_polygons(centers, jnp.asarray(d), probs,
                                           jnp.ones(2, bool), 100, 100))
    # label ids are prob-descending: label 1 = the 0.9 polygon at col 58
    assert labels[50, 58] == 1
    assert labels[50, 44] == 2  # only inside the low-prob polygon
    # contested pixels (inside both) belong to the higher-prob polygon
    assert labels[50, 50] == 1 and labels[50, 54] == 1


def test_rasterize_tiled_equals_scatter(rng):
    """rasterize_polygons_tiled must reproduce the scatter path exactly when
    the scatter patch is large enough that nothing clips."""
    from cell_image_analysis_tpu.ops.rasterize import rasterize_polygons_tiled

    K, R, H, W = 24, 32, 128, 256
    centers = np.stack([rng.uniform(-8, H + 8, K), rng.uniform(-8, W + 8, K)],
                       1).astype(np.float32)
    dists = rng.uniform(4.0, 18.0, (K, R)).astype(np.float32)
    probs = rng.uniform(0.2, 1.0, K).astype(np.float32)
    keep = rng.uniform(size=K) > 0.3
    args = (jnp.asarray(centers), jnp.asarray(dists), jnp.asarray(probs),
            jnp.asarray(keep))
    ref = np.asarray(rasterize_polygons(*args, H, W, patch=64))
    got = np.asarray(rasterize_polygons_tiled(*args, H, W, tile=64, m_cap=24)[0])
    np.testing.assert_array_equal(got, ref)


def test_rasterize_tiled_equals_scatter_with_cap(rng):
    from cell_image_analysis_tpu.ops.rasterize import rasterize_polygons_tiled

    K, R, H, W = 40, 32, 128, 128
    centers = np.stack([rng.uniform(0, H, K), rng.uniform(0, W, K)],
                       1).astype(np.float32)
    dists = rng.uniform(3.0, 10.0, (K, R)).astype(np.float32)
    probs = rng.uniform(0.2, 1.0, K).astype(np.float32)
    keep = rng.uniform(size=K) > 0.2
    args = (jnp.asarray(centers), jnp.asarray(dists), jnp.asarray(probs),
            jnp.asarray(keep))
    ref = np.asarray(rasterize_polygons(*args, H, W, patch=48, raster_cap=16))
    got = np.asarray(rasterize_polygons_tiled(*args, H, W, tile=32, m_cap=40,
                                              raster_cap=16)[0])
    np.testing.assert_array_equal(got, ref)


def test_rasterize_tiled_mcap_overflow_flag(rng):
    """Per-tile m_cap drops must be REPORTED: >m_cap kept polygons incident
    on one tile set the overflow flag (the scoring host then re-renders with
    the scatter path); below the cap the flag stays False."""
    from cell_image_analysis_tpu.ops.rasterize import rasterize_polygons_tiled

    K, R, H, W = 12, 32, 128, 128
    # 12 small polygons all inside tile (0, 0)
    centers = np.stack([rng.uniform(8, 24, K), rng.uniform(8, 24, K)],
                       1).astype(np.float32)
    dists = rng.uniform(2.0, 4.0, (K, R)).astype(np.float32)
    probs = rng.uniform(0.2, 1.0, K).astype(np.float32)
    keep = jnp.ones(K, bool)
    args = (jnp.asarray(centers), jnp.asarray(dists), jnp.asarray(probs), keep)
    _, ovf = rasterize_polygons_tiled(*args, H, W, tile=32, m_cap=8)
    assert bool(ovf)
    labels, ovf = rasterize_polygons_tiled(*args, H, W, tile=32, m_cap=12)
    assert not bool(ovf)
    # with capacity for all of them, nothing is dropped
    assert len(np.unique(np.asarray(labels))) == K + 1


def test_stage_a_ors_segment_overflow_into_row8():
    """A returns_overflow segment_fn's flag must reach packed-stats row 8 so
    score_frames triggers the exact fallback (the tiled rasterizer's m_cap
    drop is otherwise silent cell loss)."""
    from cell_image_analysis_tpu.pipeline.scoring import _stage_a_one

    H = W = 64
    lab = np.zeros((H, W), np.int32)
    lab[20:33, 20:33] = 1

    def seg_overflowing(seg):
        labels = jnp.asarray(lab)
        return labels, jnp.any(labels > 0)  # overflow=True, data-derived

    seg_overflowing.returns_overflow = True
    kw = dict(label_capacity=16, cell_capacity=8, crop_capacity=48,
              border_margin=2, min_area=4, max_area=4000,
              max_eccentricity=1.0, min_mean_intensity=0.0,
              min_std_intensity=0.0)
    green = jnp.asarray(np.random.default_rng(0).uniform(
        0.6, 1.0, (H, W)).astype(np.float32))
    _, _, _, packed = _stage_a_one(seg_overflowing, kw, jnp.asarray(lab, jnp.float32), green)
    assert float(packed[8].max()) == 1.0

    def seg_clean(seg):
        return jnp.asarray(lab), jnp.any(jnp.asarray(lab) > 0) & False

    seg_clean.returns_overflow = True
    _, _, _, packed = _stage_a_one(seg_clean, kw, jnp.asarray(lab, jnp.float32), green)
    assert float(packed[8].max()) == 0.0


def test_rasterize_tiled_no_patch_clipping(rng):
    """A polygon larger than the scatter patch renders fully in the tiled
    path (the scatter path clips it — its one bounded approximation)."""
    from cell_image_analysis_tpu.ops.rasterize import rasterize_polygons_tiled

    R, H, W = 32, 256, 256
    centers = jnp.asarray(np.array([[128.0, 128.0]], np.float32))
    dists = jnp.asarray(np.full((1, R), 90.0, np.float32))
    probs = jnp.asarray(np.array([0.9], np.float32))
    keep = jnp.ones(1, bool)
    got, ovf = rasterize_polygons_tiled(centers, dists, probs, keep,
                                        H, W, tile=64, m_cap=4)
    got = np.asarray(got)
    assert not bool(ovf)  # one polygon never exceeds the per-tile cap
    # radius-90 disc area fully rendered (pixel-center count ~ pi r^2)
    area = int((got == 1).sum())
    assert abs(area - np.pi * 90 * 90) < 400
    assert got[128, 128 + 85] == 1 and got[128 + 85, 128] == 1
