"""StarDist-style `predict_instances`: U-Net -> candidates -> NMS -> labels.

The reference calls `stardist_model.predict_instances(normalized_seg)`
(CAE_improved_modeltrain.py:54, improved_detection.py:63), which runs the
pretrained TF U-Net, thresholds object probabilities (registered
prob_thresh ~ 0.479), suppresses overlapping star polygons in C++ NMS
(nms_thresh = 0.3), and rasterizes the survivors to an int label map.

Here the entire chain is device-resident and jitted: percentile
normalization (csbdeep defaults), the JAX U-Net (models/unet.py), top-K
candidate selection (static shape), the fixpoint star-polygon NMS
(ops/nms.py), and scatter rasterization (ops/rasterize.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.config import SegConfig
from cell_image_analysis_tpu.models.unet import StarDistUNet
from cell_image_analysis_tpu.ops.nms import star_nms
from cell_image_analysis_tpu.ops.percentile import normalize_percentile
from cell_image_analysis_tpu.ops.rasterize import rasterize_polygons


class InstanceDetails(NamedTuple):
    """The `details` companion of predict_instances."""

    points: jax.Array  # (K, 2) candidate centers (full-res coords)
    dists: jax.Array   # (K, R)
    probs: jax.Array   # (K,)
    keep: jax.Array    # (K,) bool — surviving instances
    # scalar bool: the tiled rasterizer dropped polygons in some tile
    # (per-tile m_cap exceeded) — labels are missing cells; re-render with
    # raster_mode="scatter".  Always False on the scatter path.
    raster_overflow: jax.Array
    # scalar bool: the sparse NMS dropped candidate pairs (nms_max_pairs
    # exceeded) — suppressions may be missed; re-run with a larger budget
    # (the pipeline fallback twins use the exact K*K set).
    nms_overflow: jax.Array
    # scalar bool: the top-K candidate cap likely dropped whole CELLS —
    # the count of above-threshold LOCAL MAXIMA of the prob map (each a
    # potential NMS winner, ~1 per cell) exceeds max_candidates.  Raw
    # above-threshold pixel count is NOT the signal (~25 px cluster per
    # cell center and NMS suppresses them; K = a few per expected cell is
    # fine).  This silently bound at plate scale before r4: 4096^2 frames
    # extracted 62/1280 planted cells with every other overflow flag green
    # (BENCH.md r4s3).  max_candidates must scale with frame area.
    cand_overflow: jax.Array


def _pad_to_multiple(x: jax.Array, m: int) -> jax.Array:
    h, w = x.shape
    ph = (-h) % m
    pw = (-w) % m
    if ph or pw:
        x = jnp.pad(x, ((0, ph), (0, pw)), mode="reflect")
    return x


@partial(jax.jit, static_argnames=("model", "max_candidates", "prob_thresh", "nms_thresh",
                                   "metric", "patch", "height", "width", "raster_cap",
                                   "raster_mode", "raster_tile", "raster_m_cap",
                                   "nms_max_pairs"))
def _predict_instances_impl(
    model: StarDistUNet,
    variables: dict,
    img: jax.Array,
    height: int,
    width: int,
    max_candidates: int,
    prob_thresh: float,
    nms_thresh: float,
    metric: str,
    patch: int,
    raster_cap: int | None = None,
    raster_mode: str = "tiled",
    raster_tile: int = 128,
    raster_m_cap: int = 16,
    nms_max_pairs: int = 8192,
):
    from cell_image_analysis_tpu.models.unet import (
        dist_head_rows,
        unet_apply,
        unet_apply_late,
    )

    gy, gx = model.grid
    x = img[None, :, :, None]
    late = unet_apply_late(model, variables, x)
    if late is not None:
        # late dist head: the (h', w', R) dist map is only ever read at the
        # top-K candidate pixels, so the head runs as a (K, head_filters)
        # matmul on gathered feature rows instead of a full-map 1x1 conv
        # (saves writing + re-reading a (h', w', 32) f32 tensor per frame).
        prob, feat = late
        prob, feat = prob[0], feat[0]      # (h', w'), (h', w', F)
        hp, wp = prob.shape
        flat = prob.reshape(-1)
        top_p, top_i = jax.lax.top_k(flat, max_candidates)
        feat_rows = feat.reshape(-1, feat.shape[-1])[top_i]
        cand_dists = dist_head_rows(variables, feat_rows)
    else:
        prob, dist = unet_apply(model, variables, x, train=False)
        prob, dist = prob[0], dist[0]      # (h', w'), (h', w', R)
        hp, wp = prob.shape
        flat = prob.reshape(-1)
        top_p, top_i = jax.lax.top_k(flat, max_candidates)
        cand_dists = dist.reshape(-1, dist.shape[-1])[top_i]
    valid = top_p > prob_thresh
    # candidate-cap guard (InstanceDetails.cand_overflow): count the
    # above-threshold local maxima of the prob map (3x3 neighborhood) —
    # each is a potential NMS winner, so more of them than max_candidates
    # means the top-K likely dropped whole cells
    neigh = jax.lax.reduce_window(
        prob, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    # count only grid pixels inside the UNPADDED frame: the input is
    # reflect-padded to the U-Net alignment, so a real peak within the pad
    # distance of a border has a mirror twin in the pad region that would
    # double-count it and spuriously trip the (conservative-direction)
    # overflow flag, triggering a useless exact-fallback re-run
    in_img = ((jnp.arange(hp)[:, None] * gy < height)
              & (jnp.arange(wp)[None, :] * gx < width))
    n_peaks = jnp.sum((prob >= neigh) & (prob > prob_thresh) & in_img)
    cand_ovf = n_peaks > max_candidates
    rows = (top_i // wp).astype(jnp.float32) * gy
    cols = (top_i % wp).astype(jnp.float32) * gx
    centers = jnp.stack([rows, cols], axis=1)
    cand_dists = jnp.maximum(cand_dists, 1e-3)

    keep, nms_ovf = star_nms(centers, cand_dists, top_p, valid,
                             nms_thresh=nms_thresh, metric=metric,
                             max_pairs=min(nms_max_pairs,
                                           max_candidates * max_candidates),
                             return_overflow=True)
    if raster_mode == "tiled" and height % raster_tile == 0 and width % raster_tile == 0:
        from cell_image_analysis_tpu.ops.rasterize import rasterize_polygons_tiled

        labels, r_ovf = rasterize_polygons_tiled(centers, cand_dists, top_p, keep,
                                                 height, width, tile=raster_tile,
                                                 m_cap=raster_m_cap, raster_cap=raster_cap)
    else:
        labels = rasterize_polygons(centers, cand_dists, top_p, keep, height, width,
                                    patch=patch, raster_cap=raster_cap)
        r_ovf = jnp.any(keep) & False
    return labels, InstanceDetails(points=centers, dists=cand_dists, probs=top_p,
                                   keep=keep, raster_overflow=r_ovf,
                                   nms_overflow=nms_ovf, cand_overflow=cand_ovf)


def predict_instances(seg_channel: jax.Array, variables: dict, cfg: SegConfig = SegConfig(),
                      model: StarDistUNet | None = None, normalize: bool = True):
    """Full predict_instances parity path.  `seg_channel` is the raw channel;
    normalization uses csbdeep percentile defaults (cfg.norm_pmin/pmax)."""
    if model is None:
        from cell_image_analysis_tpu.models.unet import resolve_wb16

        model = StarDistUNet(n_rays=cfg.n_rays, depth=cfg.unet_depth,
                             base_filters=cfg.base_filters, head_filters=cfg.head_filters,
                             grid=cfg.grid, dtype=cfg.unet_dtype,
                             precision=getattr(cfg, "unet_precision", "high"),
                             lvl0_precision=(getattr(cfg, "unet_lvl0_precision", "") or None),
                             lvl0_s2d=getattr(cfg, "unet_lvl0_s2d", True),
                             winograd=getattr(cfg, "unet_winograd", "off"),
                             hilo=getattr(cfg, "unet_hilo", "off"),
                             wb16=resolve_wb16(getattr(cfg, "unet_wb16", "auto"),
                                               variables))
    h, w = seg_channel.shape
    x = seg_channel
    if normalize:
        x = normalize_percentile(x, pmin=cfg.norm_pmin, pmax=cfg.norm_pmax)
    x = _pad_to_multiple(x.astype(jnp.float32), 2 ** cfg.unet_depth)
    return _predict_instances_impl(
        model, variables, x, h, w,
        max_candidates=cfg.max_candidates, prob_thresh=cfg.prob_thresh,
        nms_thresh=cfg.nms_thresh, metric=cfg.nms_metric, patch=cfg.raster_patch,
        raster_cap=(cfg.raster_cap or None), raster_mode=cfg.raster_mode,
        raster_tile=cfg.raster_tile, raster_m_cap=cfg.raster_m_cap,
        nms_max_pairs=getattr(cfg, "nms_max_pairs", 8192),
    )
