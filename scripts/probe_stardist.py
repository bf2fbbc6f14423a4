#!/usr/bin/env python
"""Decompose the StarDist backend's per-stage costs on TPU (cumulative
stages, explicit host fetches — jax.block_until_ready does not sync through
the tunnel).  Stages: U-Net forward -> +top-K candidates -> +NMS ->
+rasterize -> full stage A (extract_candidates) -> full fused screening.

Usage: python scripts/probe_stardist.py [batch] [size]
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.config import SegConfig
from cell_image_analysis_tpu.models.stardist import _pad_to_multiple
from cell_image_analysis_tpu.models.unet import StarDistUNet
from cell_image_analysis_tpu.ops.nms import star_nms
from cell_image_analysis_tpu.ops.percentile import normalize_percentile
from cell_image_analysis_tpu.ops.rasterize import rasterize_polygons
from cell_image_analysis_tpu.utils.bench import (
    _fit_params,
    _make_frames,
    load_synthetic_unet_variables,
    stardist_backend,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

frames = _make_frames(BATCH, SIZE, 80 * SIZE * SIZE // (1024 * 1024))
stack = np.stack(frames)
segs = jnp.asarray(stack[..., 2].astype(np.float32))
greens = jnp.asarray(stack[..., 1].astype(np.float32))

import os
variables = load_synthetic_unet_variables()
backend = stardist_backend(
    max_candidates=int(os.environ.get("CIA_BENCH_SD_CAND", "256")),
    raster_patch=int(os.environ.get("CIA_BENCH_SD_PATCH", "96")),
    raster_cap=int(os.environ.get("CIA_BENCH_SD_RCAP", "128")),
    runs_props=os.environ.get("CIA_BENCH_SD_RUNS", "1") == "1",
    nms_max_pairs=(int(os.environ["CIA_BENCH_SD_NMSPAIRS"])
                   if "CIA_BENCH_SD_NMSPAIRS" in os.environ else None),
)
# plate-scale probes (r5, VERDICT r4 item 8): cell_capacity/rcap must scale
# with area like production's _segment_for, or stage A/full silently bind
CELL_CAP = int(os.environ.get("CIA_PROBE_CELL_CAP", "128"))
RCAP = int(os.environ.get("CIA_PROBE_RCAP", "64"))
cfg = backend.cfg
model = backend.model


def t(name, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)


@jax.jit
def s1_forward(segs):
    def one(seg):
        x = normalize_percentile(seg, cfg.norm_pmin, cfg.norm_pmax)
        x = _pad_to_multiple(x, 2 ** cfg.unet_depth)
        from cell_image_analysis_tpu.models.unet import unet_apply
        prob, dist = unet_apply(model, variables, x[None, :, :, None], train=False)
        return prob[0], dist[0]
    return jax.vmap(one)(segs)


@jax.jit
def s2_candidates(segs):
    """Mirrors production (models/stardist._predict_instances_impl): the
    late dist head — (prob, feat) forward, dist head on gathered rows."""
    from cell_image_analysis_tpu.models.unet import dist_head_rows, unet_apply_late

    def one(seg):
        x = normalize_percentile(seg, cfg.norm_pmin, cfg.norm_pmax)
        x = _pad_to_multiple(x, 2 ** cfg.unet_depth)[None, :, :, None]
        late = unet_apply_late(model, variables, x)
        if late is not None:
            p, feat = late
            p, feat = p[0], feat[0]
            hp, wp = p.shape
            top_p, top_i = jax.lax.top_k(p.reshape(-1), cfg.max_candidates)
            cd = dist_head_rows(variables, feat.reshape(-1, feat.shape[-1])[top_i])
        else:
            from cell_image_analysis_tpu.models.unet import unet_apply

            p, d = unet_apply(model, variables, x, train=False)
            p, d = p[0], d[0]
            hp, wp = p.shape
            top_p, top_i = jax.lax.top_k(p.reshape(-1), cfg.max_candidates)
            cd = d.reshape(-1, d.shape[-1])[top_i]
        valid = top_p > cfg.prob_thresh
        rows = (top_i // wp).astype(jnp.float32) * cfg.grid[0]
        cols = (top_i % wp).astype(jnp.float32) * cfg.grid[1]
        centers = jnp.stack([rows, cols], axis=1)
        return centers, jnp.maximum(cd, 1e-3), top_p, valid
    return jax.vmap(one)(segs)


@jax.jit
def s3_nms(segs):
    centers, cd, top_p, valid = s2_candidates(segs)
    keep = jax.vmap(lambda c, d, p, v: star_nms(
        c, d, p, v, nms_thresh=cfg.nms_thresh, metric=cfg.nms_metric,
        max_pairs=min(cfg.nms_max_pairs, cfg.max_candidates ** 2),
    ))(centers, cd, top_p, valid)
    return centers, cd, top_p, keep


@jax.jit
def s4_raster(segs):
    from cell_image_analysis_tpu.ops.rasterize import rasterize_polygons_tiled

    centers, cd, top_p, keep = s3_nms(segs)
    if cfg.raster_mode == "tiled" and SIZE % cfg.raster_tile == 0:
        f = lambda c, d, p, k: rasterize_polygons_tiled(
            c, d, p, k, SIZE, SIZE, tile=cfg.raster_tile,
            m_cap=cfg.raster_m_cap, raster_cap=(cfg.raster_cap or None))[0]
    else:
        f = lambda c, d, p, k: rasterize_polygons(
            c, d, p, k, SIZE, SIZE, patch=cfg.raster_patch,
            raster_cap=(cfg.raster_cap or None))
    labels = jax.vmap(f)(centers, cd, top_p, keep)
    return labels


@jax.jit
def s5_stage_a(segs, greens):
    from cell_image_analysis_tpu.ops.extract import (
        extract_candidates,
        extract_candidates_from_labels_runs,
    )

    lcap = cfg.raster_cap or cfg.max_candidates

    def one(seg, green):
        lab = backend(seg)
        if getattr(backend, "returns_overflow", False):
            lab, _ = lab
        if getattr(backend, "runs_props", False):
            cand, _ = extract_candidates_from_labels_runs(
                lab, green, label_capacity=lcap, cell_capacity=CELL_CAP,
                rcap=int(os.environ.get("CIA_BENCH_SD_RUNS_RCAP", "32")))
            return cand
        return extract_candidates(lab, green, label_capacity=lcap,
                                  cell_capacity=CELL_CAP)
    return jax.vmap(one)(segs, greens)


print(f"probe_stardist: batch={BATCH} size={SIZE} max_candidates={cfg.max_candidates} "
      f"patch={cfg.raster_patch} rcap={cfg.raster_cap} runs={backend.runs_props}", flush=True)

t("s1 unet forward      ", lambda: float(s1_forward(segs)[0].sum()))
t("s2 + candidates      ", lambda: float(s2_candidates(segs)[0].sum()))
t("s3 + nms             ", lambda: float(s3_nms(segs)[3].sum()))
t("s4 + rasterize       ", lambda: float(s4_raster(segs).sum()))
t("s5 stage A (extract) ", lambda: float(s5_stage_a(segs, greens).crops.sum()))

# full fused screening
smodel, sparams, _ = _fit_params()
from cell_image_analysis_tpu.pipeline.scoring import score_frames_fused


def full():
    scores, stats = score_frames_fused(
        smodel, sparams, segs, greens, backend,
        label_capacity=(cfg.raster_cap or cfg.max_candidates),
        cell_capacity=CELL_CAP, rcap=RCAP,
        chunk=32, caps=(64, 96),
    )
    return len(stats["area"])


n = full()
print(f"cells/batch: {n}", flush=True)
t("s6 fused screening   ", full)
