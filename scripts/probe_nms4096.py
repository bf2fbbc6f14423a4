#!/usr/bin/env python
"""Attribute the plate-scale NMS cost (r5: +284 ms/frame at K=4096,
pairs=2^19 — 38% of the whole 4096^2 frame budget) to its sub-stages:
pair-candidate build + top_k compaction vs quadrature vs fixpoint.

Usage: python scripts/probe_nms4096.py [K] [PAIRS_LOG2] [size]
"""
import os
import sys
import time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

K = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
PAIRS = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 19)
SIZE = int(sys.argv[3]) if len(sys.argv) > 3 else 4096

from cell_image_analysis_tpu.models.stardist import predict_instances
from cell_image_analysis_tpu.ops.nms import (
    _quadrature,
    polygon_areas,
    radius_at,
    star_nms,
)
from cell_image_analysis_tpu.utils.bench import (
    _make_frames,
    stardist_backend,
)

frame = _make_frames(1, SIZE, 80 * SIZE * SIZE // (1024 * 1024))[0]
seg = jnp.asarray(frame[..., 2].astype(np.float32))
be = stardist_backend(max_candidates=K, raster_cap=2048,
                      nms_max_pairs=PAIRS)
_, det = predict_instances(seg, be.variables, be.cfg, model=be.model)
centers, dists, probs, valid = (det.points, det.dists, det.probs,
                                det.probs > be.cfg.prob_thresh)
centers, dists, probs, valid = (jnp.asarray(np.asarray(a)) for a in
                                (centers, dists, probs, valid))
print(f"K={K} pairs={PAIRS} size={SIZE} "
      f"n_valid={int(np.asarray(valid).sum())}", flush=True)


@jax.jit
def t1_pairs(centers, dists, valid):
    areas = polygon_areas(dists)
    rmax = jnp.max(dists, axis=-1)
    dy = centers[:, 0][:, None] - centers[:, 0][None, :]
    dx = centers[:, 1][:, None] - centers[:, 1][None, :]
    d2 = dy * dy + dx * dx
    rsum = rmax[:, None] + rmax[None, :]
    idx = jnp.arange(K)
    cand = ((d2 < rsum * rsum) & valid[:, None] & valid[None, :]
            & (idx[:, None] < idx[None, :]))
    masked = jnp.where(cand, d2, jnp.inf).reshape(-1)
    neg, flat_idx = jax.lax.top_k(-masked, min(PAIRS, masked.shape[0]))
    return flat_idx.sum() + jnp.sum(cand)


@jax.jit
def t2_quad(centers, dists, valid):
    areas = polygon_areas(dists)
    rmax = jnp.max(dists, axis=-1)
    dy = centers[:, 0][:, None] - centers[:, 0][None, :]
    dx = centers[:, 1][:, None] - centers[:, 1][None, :]
    d2 = dy * dy + dx * dx
    rsum = rmax[:, None] + rmax[None, :]
    idx = jnp.arange(K)
    cand = ((d2 < rsum * rsum) & valid[:, None] & valid[None, :]
            & (idx[:, None] < idx[None, :]))
    masked = jnp.where(cand, d2, jnp.inf).reshape(-1)
    neg, flat_idx = jax.lax.top_k(-masked, min(PAIRS, masked.shape[0]))
    pair_ok = jnp.isfinite(neg)
    ii = flat_idx // K
    jj = flat_idx % K
    swap = areas[jj] < areas[ii]
    pi = jnp.where(swap, jj, ii)
    pj = jnp.where(swap, ii, jj)
    pts, w = _quadrature(dists[pi], centers[pi])
    dyp = pts[:, :, 0] - centers[pj, 0][:, None]
    dxp = pts[:, :, 1] - centers[pj, 1][:, None]
    rho = jnp.sqrt(dyp * dyp + dxp * dxp)
    theta = jnp.arctan2(dyp, dxp)
    rb = radius_at(dists[pj][:, None, :], theta)
    inter = jnp.sum(w * (rho <= rb), axis=1)
    return jnp.where(pair_ok, inter, 0.0).sum()


def t(name, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)


t("t1 pairs+topk   ", lambda: float(t1_pairs(centers, dists, valid)))
t("t2 + quadrature ", lambda: float(t2_quad(centers, dists, valid)))
t("t3 full star_nms", lambda: float(star_nms(
    centers, dists, probs, valid, nms_thresh=be.cfg.nms_thresh,
    metric=be.cfg.nms_metric, max_pairs=min(PAIRS, K * K)).sum()))
