"""Batched per-frame cell extraction — the pipeline's kernel, fused on device.

Reference: `extract_quality_cells` (CAE_improved_modeltrain.py:39-111,
duplicated at improved_detection.py:48-115).  The reference loops regions in
Python (SURVEY.md hot loop #2 — "the throughput killer"); here one jitted
graph per frame does: regionprops -> geometric QC -> capacity-bounded crop
gather -> raw-intensity QC (bbox-rectangle mean/std, reference semantics) ->
CLAHE -> anti-aliased 64x64 resize, emitting a fixed-capacity batch of cell
tensors + validity mask + per-cell stats.  Variable cell counts stay static
for XLA via capacity buffers and masks (SURVEY.md section 2.4).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.ops.clahe import clahe_cells
from cell_image_analysis_tpu.ops.regionprops import qc_mask, regionprops
from cell_image_analysis_tpu.ops.resize import resize_cells
from cell_image_analysis_tpu.ops.runs import (
    regionprops_from_labels,
    regionprops_from_mask,
)


class Candidates(NamedTuple):
    """Stage-A output: QC'd candidate crops in compacted (ascending-label)
    order, before CLAHE/resize.  All arrays have leading dim = cell_capacity."""

    crops: jax.Array       # (C, cap, cap) raw green crops
    heights: jax.Array     # (C,) int32
    widths: jax.Array      # (C,) int32
    valid: jax.Array       # (C,) bool — passed geometry + intensity QC
    label_ids: jax.Array   # (C,) int32
    area: jax.Array
    eccentricity: jax.Array
    mean_intensity: jax.Array
    std_intensity: jax.Array
    n_valid: jax.Array     # () int32


class ExtractedCells(NamedTuple):
    cells: jax.Array       # (C, out, out) float32 in [0,1]
    valid: jax.Array       # (C,) bool
    label_ids: jax.Array   # (C,) int32 original label (1-based); 0 if unused slot
    area: jax.Array        # (C,) int32
    eccentricity: jax.Array  # (C,) float32
    mean_intensity: jax.Array  # (C,) float32 — raw bbox-crop mean
    std_intensity: jax.Array   # (C,) float32 — raw bbox-crop std (ddof=0)
    n_candidates: jax.Array    # () int32 — geometric-QC survivors (pre-intensity)


@partial(
    jax.jit,
    static_argnames=(
        "label_capacity", "cell_capacity", "crop_capacity", "out_size",
        "border_margin", "min_area", "max_area", "fg_fraction",
    ),
)
def extract_cells(
    labels: jax.Array,
    green: jax.Array,
    label_capacity: int = 1024,
    cell_capacity: int = 512,
    crop_capacity: int = 192,
    out_size: int = 64,
    border_margin: int = 10,
    min_area: int = 200,
    max_area: int = 8000,
    max_eccentricity: float = 0.95,
    min_mean_intensity: float = 0.5,
    min_std_intensity: float = 0.1,
    fg_fraction: float = 0.25,
) -> ExtractedCells:
    """labels: (H, W) int32 instance map; green: (H, W) raw analysis channel."""
    h, w = labels.shape
    green = green.astype(jnp.float32)

    props = regionprops(labels, capacity=label_capacity, fg_fraction=fg_fraction)
    geo = qc_mask(
        props, jnp.int32(h), jnp.int32(w),
        border_margin=border_margin, min_area=min_area, max_area=max_area,
        max_eccentricity=max_eccentricity,
    )

    # capacity-bounded candidate selection, ascending label order (matches the
    # reference's regionprops iteration order)
    sel = jnp.nonzero(geo, size=cell_capacity, fill_value=label_capacity)[0]
    in_range = sel < label_capacity
    sel_c = jnp.minimum(sel, label_capacity - 1)

    minr = props.min_r[sel_c]
    minc = props.min_c[sel_c]
    ch = props.max_r[sel_c] - minr
    cw = props.max_c[sel_c] - minc
    fits = (ch <= crop_capacity) & (cw <= crop_capacity)
    cand = in_range & fits
    ch = jnp.clip(ch, 1, crop_capacity)
    cw = jnp.clip(cw, 1, crop_capacity)

    # gather raw crops with dynamic slices from a padded frame
    padded = jnp.pad(green, ((0, crop_capacity), (0, crop_capacity)))

    def one_crop(r0, c0):
        return jax.lax.dynamic_slice(padded, (r0, c0), (crop_capacity, crop_capacity))

    crops = jax.vmap(one_crop)(minr, minc)  # (C, cap, cap)

    # raw-intensity QC over the bbox rectangle (reference semantics:
    # np.mean/np.std of the unmasked crop, CAE_improved_modeltrain.py:80-87)
    ar = jnp.arange(crop_capacity)
    rect = (ar[None, :, None] < ch[:, None, None]) & (ar[None, None, :] < cw[:, None, None])
    area_rect = jnp.maximum((ch * cw).astype(jnp.float32), 1.0)
    s1 = jnp.sum(jnp.where(rect, crops, 0.0), axis=(1, 2))
    mean = s1 / area_rect
    centered = jnp.where(rect, crops - mean[:, None, None], 0.0)
    var = jnp.sum(centered * centered, axis=(1, 2)) / area_rect
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    intensity_ok = (mean >= min_mean_intensity) & (std >= min_std_intensity)

    valid = cand & intensity_ok

    # CLAHE + anti-aliased resize (the reference per-cell preprocessing,
    # CAE_improved_modeltrain.py:92-93)
    eq = clahe_cells(crops, ch, cw)
    cells = resize_cells(eq, ch, cw, out_size=out_size)
    cells = jnp.where(valid[:, None, None], cells, 0.0)

    return ExtractedCells(
        cells=cells,
        valid=valid,
        label_ids=jnp.where(valid, sel_c + 1, 0).astype(jnp.int32),
        area=jnp.where(valid, props.area[sel_c], 0),
        eccentricity=jnp.where(valid, props.eccentricity[sel_c], 0.0),
        mean_intensity=jnp.where(valid, mean, 0.0),
        std_intensity=jnp.where(valid, std, 0.0),
        n_candidates=jnp.sum(cand.astype(jnp.int32)),
    )


def _candidates_from_props(
    props,
    green: jax.Array,
    label_capacity: int,
    cell_capacity: int,
    crop_capacity: int,
    border_margin: int,
    min_area: int,
    max_area: int,
    max_eccentricity: float,
    min_mean_intensity: float,
    min_std_intensity: float,
) -> Candidates:
    """Shared stage-A tail: geometric QC -> capacity-bounded crop gather ->
    raw-intensity QC -> front-repacking, from an already-computed RegionProps
    (either the label-map path or the run-length path)."""
    h, w = green.shape
    green = green.astype(jnp.float32)
    geo = qc_mask(
        props, jnp.int32(h), jnp.int32(w),
        border_margin=border_margin, min_area=min_area, max_area=max_area,
        max_eccentricity=max_eccentricity,
    )
    sel = jnp.nonzero(geo, size=cell_capacity, fill_value=label_capacity)[0]
    in_range = sel < label_capacity
    sel_c = jnp.minimum(sel, label_capacity - 1)
    minr = props.min_r[sel_c]
    minc = props.min_c[sel_c]
    ch = props.max_r[sel_c] - minr
    cw = props.max_c[sel_c] - minc
    fits = (ch <= crop_capacity) & (cw <= crop_capacity)
    cand = in_range & fits
    ch = jnp.clip(ch, 1, crop_capacity)
    cw = jnp.clip(cw, 1, crop_capacity)

    padded = jnp.pad(green, ((0, crop_capacity), (0, crop_capacity)))
    crops = jax.vmap(
        lambda r0, c0: jax.lax.dynamic_slice(padded, (r0, c0), (crop_capacity, crop_capacity))
    )(minr, minc)

    ar = jnp.arange(crop_capacity)
    rect = (ar[None, :, None] < ch[:, None, None]) & (ar[None, None, :] < cw[:, None, None])
    area_rect = jnp.maximum((ch * cw).astype(jnp.float32), 1.0)
    mean = jnp.sum(jnp.where(rect, crops, 0.0), axis=(1, 2)) / area_rect
    centered = jnp.where(rect, crops - mean[:, None, None], 0.0)
    std = jnp.sqrt(jnp.maximum(jnp.sum(centered * centered, axis=(1, 2)) / area_rect, 0.0))
    valid = cand & (mean >= min_mean_intensity) & (std >= min_std_intensity)

    # repack valid cells to the front (stable => keeps ascending label order)
    order = jnp.nonzero(valid, size=cell_capacity, fill_value=cell_capacity)[0]
    ok = order < cell_capacity
    o = jnp.minimum(order, cell_capacity - 1)
    return Candidates(
        crops=crops[o],
        heights=jnp.where(ok, ch[o], 1),
        widths=jnp.where(ok, cw[o], 1),
        valid=ok,
        label_ids=jnp.where(ok, sel_c[o] + 1, 0).astype(jnp.int32),
        area=jnp.where(ok, props.area[sel_c][o], 0),
        eccentricity=jnp.where(ok, props.eccentricity[sel_c][o], 0.0),
        mean_intensity=jnp.where(ok, mean[o], 0.0),
        std_intensity=jnp.where(ok, std[o], 0.0),
        n_valid=jnp.sum(valid.astype(jnp.int32)),
    )


@partial(
    jax.jit,
    static_argnames=(
        "label_capacity", "cell_capacity", "crop_capacity",
        "border_margin", "min_area", "max_area", "fg_fraction",
    ),
)
def extract_candidates(
    labels: jax.Array,
    green: jax.Array,
    label_capacity: int = 1024,
    cell_capacity: int = 512,
    crop_capacity: int = 192,
    border_margin: int = 10,
    min_area: int = 200,
    max_area: int = 8000,
    max_eccentricity: float = 0.95,
    min_mean_intensity: float = 0.5,
    min_std_intensity: float = 0.1,
    fg_fraction: float = 0.25,
) -> Candidates:
    """Stage A of the chunked extraction path: everything up to (but not
    including) CLAHE/resize, with the surviving cells repacked to the front
    in ascending-label order so stage B (preprocess_chunk) runs only
    ceil(n/chunk) times on actual cells rather than the full capacity.

    Splitting here is the throughput fix for the capacity-vs-occupancy waste:
    CLAHE/resize cost scales with the padded pixel count, so they run on
    packed chunks (profiled 4-25x win at typical cell counts)."""
    props = regionprops(labels, capacity=label_capacity, fg_fraction=fg_fraction)
    return _candidates_from_props(
        props, green,
        label_capacity=label_capacity, cell_capacity=cell_capacity,
        crop_capacity=crop_capacity, border_margin=border_margin,
        min_area=min_area, max_area=max_area,
        max_eccentricity=max_eccentricity,
        min_mean_intensity=min_mean_intensity,
        min_std_intensity=min_std_intensity,
    )


@partial(
    jax.jit,
    static_argnames=(
        "label_capacity", "cell_capacity", "crop_capacity",
        "border_margin", "min_area", "max_area", "rcap", "connectivity",
    ),
)
def extract_candidates_from_mask(
    mask: jax.Array,
    green: jax.Array,
    label_capacity: int = 1024,
    cell_capacity: int = 512,
    crop_capacity: int = 192,
    border_margin: int = 10,
    min_area: int = 200,
    max_area: int = 8000,
    max_eccentricity: float = 0.95,
    min_mean_intensity: float = 0.5,
    min_std_intensity: float = 0.1,
    rcap: int = 32,
    connectivity: int = 1,
) -> tuple[Candidates, jax.Array]:
    """Stage A from a boolean foreground mask via the run-length path
    (ops/runs.py): row-run table -> hook CC over runs -> closed-form run
    moments.  Skips the two pixel-level bottlenecks of the label-map path —
    iterative full-frame CC and fg-pixel compaction — measured 88 ms vs
    259 ms per 8x1024^2 batch on the production TPU (scripts/probe_runs.py).
    The instance label map is never materialized.

    Returns (Candidates, overflow); `overflow` (device bool) is True when
    some row had more than `rcap` runs — results are then untrustworthy and
    callers must fall back to the exact label-map path (extract_candidates).

    rcap=32 default: the hook-CC overlap tensors scale with rcap^2 and the
    run-table top_k with rcap, while measured plates peak at 13 runs/row
    even at 5x the bench cell density (post-opening runs are >=3 px); the
    overflow->fallback contract covers anything denser.
    """
    props, overflow = regionprops_from_mask(
        mask, capacity=label_capacity, rcap=rcap, connectivity=connectivity
    )
    return _candidates_from_props(
        props, green,
        label_capacity=label_capacity, cell_capacity=cell_capacity,
        crop_capacity=crop_capacity, border_margin=border_margin,
        min_area=min_area, max_area=max_area,
        max_eccentricity=max_eccentricity,
        min_mean_intensity=min_mean_intensity,
        min_std_intensity=min_std_intensity,
    ), overflow


@partial(jax.jit, static_argnames=("out_size", "clip_limit", "nbins", "grid"))
def preprocess_chunk(
    crops: jax.Array, heights: jax.Array, widths: jax.Array,
    out_size: int = 64, clip_limit: float = 0.02, nbins: int = 256, grid: int = 8,
) -> jax.Array:
    """Stage B: CLAHE + anti-aliased resize on a packed chunk."""
    eq = clahe_cells(crops, heights, widths, clip_limit=clip_limit, nbins=nbins, grid=grid)
    return resize_cells(eq, heights, widths, out_size=out_size)


@partial(jax.jit, static_argnames=("model", "cap", "out_size", "clip_limit", "nbins", "grid", "min_votes"))
def preprocess_gather_score(
    model,
    scoring_params,
    crops: jax.Array,
    heights: jax.Array,
    widths: jax.Array,
    idx: jax.Array,
    cap: int,
    out_size: int = 64,
    clip_limit: float = 0.02,
    nbins: int = 256,
    grid: int = 8,
    min_votes: int = 2,
):
    """Fused stage B + scoring: gather -> CLAHE -> resize -> the full scoring
    graph, in ONE dispatch.  Only the per-cell score vectors (KBs) return to
    the host — bulk cell tensors never cross the host<->device link, which
    dominates cost on remote-attached devices (~100 ms/MB measured here)."""
    from cell_image_analysis_tpu.pipeline.scoring import score_cells

    c = crops[idx][:, :cap, :cap]
    h = heights[idx]
    w = widths[idx]
    eq = clahe_cells(c, h, w, clip_limit=clip_limit, nbins=nbins, grid=grid)
    cells = resize_cells(eq, h, w, out_size=out_size)
    s = score_cells(model, scoring_params, cells[..., None], min_votes=min_votes)
    # pack into one (chunk, 9 + fft_dim) array so the host needs a single
    # fetch per chunk (each device->host round trip costs ~30 ms here)
    return jnp.concatenate(
        [
            s.reconstruction_mse[:, None], s.reconstruction_mae[:, None],
            s.conservative_predictions[:, None].astype(jnp.float32),
            s.moderate_predictions[:, None].astype(jnp.float32),
            s.conservative_scores[:, None], s.moderate_scores[:, None],
            s.ensemble_predictions[:, None].astype(jnp.float32),
            s.fft_predictions[:, None].astype(jnp.float32),
            s.fft_scores[:, None],
            s.fft,
        ],
        axis=1,
    )


@partial(jax.jit, static_argnames=("cap", "out_size", "clip_limit", "nbins", "grid"))
def preprocess_gather(
    crops: jax.Array,     # (N, full_cap, full_cap) pooled candidate crops
    heights: jax.Array,   # (N,)
    widths: jax.Array,    # (N,)
    idx: jax.Array,       # (chunk,) indices into the pool
    cap: int,             # crop side for this bucket (<= full_cap)
    out_size: int = 64,
    clip_limit: float = 0.02,
    nbins: int = 256,
    grid: int = 8,
) -> jax.Array:
    """Fused gather + CLAHE + resize for one size bucket: a single dispatch
    per chunk (host round-trips cost ~30 ms each through the device tunnel,
    so stage B is one jitted call instead of slice+preprocess)."""
    c = crops[idx][:, :cap, :cap]
    h = heights[idx]
    w = widths[idx]
    eq = clahe_cells(c, h, w, clip_limit=clip_limit, nbins=nbins, grid=grid)
    return resize_cells(eq, h, w, out_size=out_size)


def _preprocess_pool(crops, heights, widths, n, hs_np, ws_np, chunk, small_cap,
                     out_size, clip_limit):
    """Bucketed stage B over a device-resident candidate pool.

    Per-cell size partition (host, from the already-fetched h/w arrays) into
    a small-crop bucket and a full-size bucket; each bucket runs fused
    gather+CLAHE+resize chunks.  Returns (n, out, out) float32 preserving
    pool order."""
    import numpy as np

    full_cap = crops.shape[-1]
    cells = np.empty((n, out_size, out_size), np.float32)
    small = np.flatnonzero((hs_np[:n] <= small_cap) & (ws_np[:n] <= small_cap))
    large = np.flatnonzero((hs_np[:n] > small_cap) | (ws_np[:n] > small_cap))
    for bucket_idx, cap in ((small, small_cap), (large, full_cap)):
        for start in range(0, len(bucket_idx), chunk):
            take = bucket_idx[start : start + chunk]
            idx = np.full(chunk, take[0], np.int32)
            idx[: len(take)] = take
            out = preprocess_gather(
                crops, heights, widths, jnp.asarray(idx), cap,
                out_size=out_size, clip_limit=clip_limit,
            )
            cells[take] = np.asarray(out)[: len(take)]
    return cells


def extract_cells_chunked(
    labels: jax.Array,
    green: jax.Array,
    chunk: int = 128,
    small_cap: int = 96,
    out_size: int = 64,
    clip_limit: float = 0.02,
    **candidate_kwargs,
):
    """Host orchestrator: stage A once per frame, bucketed fused stage B.

    Returns (cells (n, out, out) np.float32, stats dict of np arrays)."""
    import numpy as np

    cand = extract_candidates(labels, green, **candidate_kwargs)
    chunk = min(chunk, cand.crops.shape[0])
    # one consolidated device->host fetch for all small per-cell arrays
    nv, lab, area, ecc, mean, std, hs, ws = (
        np.asarray(x) for x in (
            cand.n_valid, cand.label_ids, cand.area, cand.eccentricity,
            cand.mean_intensity, cand.std_intensity, cand.heights, cand.widths,
        )
    )
    n = int(nv)
    stats = dict(label_ids=lab[:n], area=area[:n], eccentricity=ecc[:n],
                 mean_intensity=mean[:n], std_intensity=std[:n])
    if n == 0:
        return np.zeros((0, out_size, out_size), np.float32), stats
    cells = _preprocess_pool(cand.crops, cand.heights, cand.widths, n, hs, ws,
                             chunk, small_cap, out_size, clip_limit)
    return cells, stats


@partial(jax.jit, static_argnames=("segment_fn", "ckw"))
def _candidates_batch(segs, greens, segment_fn, ckw):
    """Vmapped segmentation + stage A over a frame batch.  Module-level jit
    (an inline `@jax.jit def stage_a` would be a new function object per
    call, re-tracing the whole graph every batch)."""
    kwargs = dict(ckw)

    def one(seg, green):
        labels = segment_fn(seg)
        if getattr(segment_fn, "returns_overflow", False):
            labels, _ = labels  # raster overflow handled by the scoring paths
        # uint16 label map rides along for host-side report stats (solidity
        # needs the full map; uint16 halves the tunnel transfer, and label
        # capacities are << 65536)
        return extract_candidates(labels, green, **kwargs), labels.astype(jnp.uint16)

    return jax.vmap(one)(segs, greens)


def extract_cells_frames(
    segs: jax.Array,
    greens: jax.Array,
    segment_fn,
    chunk: int = 128,
    small_cap: int = 96,
    out_size: int = 64,
    clip_limit: float = 0.02,
    return_labels: bool = False,
    **candidate_kwargs,
):
    """Batched multi-frame extraction: segmentation + stage A vmapped over a
    (B, H, W) stack of same-shape frames in ONE dispatch, candidates pooled
    across frames, then bucketed stage B over the whole pool — amortizing
    both dispatch latency and chunk padding across frames.

    `segment_fn`: (H, W) seg channel -> (H, W) int32 labels (jit-composable,
    identity-stable — the stage-A jit caches on it).
    Returns (cells (n, out, out), stats dict incl. `frame_index`); with
    `return_labels` also the (B, H, W) uint16 label maps as numpy (for
    host-side report stats like solidity)."""
    import numpy as np

    cand, labels16 = _candidates_batch(segs, greens, segment_fn,
                                       tuple(sorted(candidate_kwargs.items())))
    B, cap = cand.crops.shape[0], cand.crops.shape[1]
    crops = cand.crops.reshape(B * cap, *cand.crops.shape[2:])
    heights = cand.heights.reshape(-1)
    widths = cand.widths.reshape(-1)

    lab, area, ecc, mean, std, hs, ws, valid = (
        np.asarray(x) for x in (
            cand.label_ids.reshape(-1), cand.area.reshape(-1),
            cand.eccentricity.reshape(-1), cand.mean_intensity.reshape(-1),
            cand.std_intensity.reshape(-1), heights, widths,
            cand.valid.reshape(-1),
        )
    )
    pool_idx = np.flatnonzero(valid)  # frame-major, label-ascending order
    n = len(pool_idx)
    frame_index = pool_idx // cap
    stats = dict(label_ids=lab[pool_idx], area=area[pool_idx],
                 eccentricity=ecc[pool_idx], mean_intensity=mean[pool_idx],
                 std_intensity=std[pool_idx], frame_index=frame_index)
    if n == 0:
        empty = np.zeros((0, out_size, out_size), np.float32)
        return (empty, stats, np.asarray(labels16)) if return_labels else (empty, stats)

    # compact the pool indices: bucketed stage B addresses the flat pool
    cells = np.empty((n, out_size, out_size), np.float32)
    small = np.flatnonzero((hs[pool_idx] <= small_cap) & (ws[pool_idx] <= small_cap))
    large = np.flatnonzero((hs[pool_idx] > small_cap) | (ws[pool_idx] > small_cap))
    full_cap = crops.shape[-1]
    for bucket, cap_b in ((small, small_cap), (large, full_cap)):
        for start in range(0, len(bucket), chunk):
            take = bucket[start : start + chunk]
            idx = np.full(chunk, pool_idx[take[0]], np.int32)
            idx[: len(take)] = pool_idx[take]
            out = preprocess_gather(crops, heights, widths, jnp.asarray(idx),
                                    cap_b, out_size=out_size, clip_limit=clip_limit)
            cells[take] = np.asarray(out)[: len(take)]
    if return_labels:
        return cells, stats, np.asarray(labels16)
    return cells, stats


@partial(
    jax.jit,
    static_argnames=(
        "label_capacity", "cell_capacity", "crop_capacity",
        "border_margin", "min_area", "max_area", "rcap",
    ),
)
def extract_candidates_from_labels_runs(
    labels: jax.Array,
    green: jax.Array,
    label_capacity: int = 1024,
    cell_capacity: int = 512,
    crop_capacity: int = 192,
    border_margin: int = 10,
    min_area: int = 200,
    max_area: int = 8000,
    max_eccentricity: float = 0.95,
    min_mean_intensity: float = 0.5,
    min_std_intensity: float = 0.1,
    rcap: int = 32,
) -> tuple[Candidates, jax.Array]:
    """Stage A from an instance LABEL map via the run path (ops/runs.
    regionprops_from_labels): no CC (labels carry ids), no fg-pixel
    compaction, segment reductions over H*RCAP run slots — the StarDist
    backend's fast stage A (the pixel regionprops measured ~130 ms per
    8x1024^2 batch).  Returns the run-capacity overflow flag; callers route
    to the exact pixel path when it is set (as with the mask path).

    rcap=32 default: the top_k run table scales with rcap and measured +8%
    end-to-end over rcap=64 (scripts/sweep_fb_rcap.py) while bench plates
    peak well below 32 runs/row; overflow falls back to the exact path, so
    the knob trades speed only."""
    props, overflow = regionprops_from_labels(
        labels, capacity=label_capacity, rcap=rcap
    )
    cand = _candidates_from_props(
        props, green,
        label_capacity=label_capacity, cell_capacity=cell_capacity,
        crop_capacity=crop_capacity, border_margin=border_margin,
        min_area=min_area, max_area=max_area,
        max_eccentricity=max_eccentricity,
        min_mean_intensity=min_mean_intensity,
        min_std_intensity=min_std_intensity,
    )
    return cand, overflow
