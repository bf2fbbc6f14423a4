#!/usr/bin/env python
"""Ablate the stage-A candidate tail (_candidates_from_props, ~37 ms over
the regionprops floor per probe_stage_a2.py) to find where the time goes.

Cumulative variants on the full mask->props->tail pipeline (8x1024^2):
  p  props only (baseline = probe_stage_a2 '+regionprops')
  q  + qc_mask + nonzero select + bbox gathers
  g  + crop gather (vmapped dynamic_slice @192)
  s  + rect mean/std intensity QC
  r  + valid repack of crops/stats      == full tail
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import threshold_mask
from cell_image_analysis_tpu.ops.regionprops import qc_mask
from cell_image_analysis_tpu.ops.runs import regionprops_from_mask
from cell_image_analysis_tpu.utils.bench import _make_frames

CCAP = 128
LCAP = 4096
CROP = 192

frames = _make_frames(8, 1024, 80)
stack = np.stack(frames)
segs = jnp.asarray(stack[..., 2].astype(np.float32))
greens = jnp.asarray(stack[..., 1].astype(np.float32))


def tail(seg, green, stage):
    h, w = green.shape
    green = green.astype(jnp.float32)
    props, _ = regionprops_from_mask(threshold_mask(seg), capacity=LCAP, rcap=32)
    if stage == "p":
        return props.area.sum() + props.eccentricity.sum()
    geo = qc_mask(props, jnp.int32(h), jnp.int32(w))
    sel = jnp.nonzero(geo, size=CCAP, fill_value=LCAP)[0]
    in_range = sel < LCAP
    sel_c = jnp.minimum(sel, LCAP - 1)
    minr = props.min_r[sel_c]
    minc = props.min_c[sel_c]
    ch = jnp.clip(props.max_r[sel_c] - minr, 1, CROP)
    cw = jnp.clip(props.max_c[sel_c] - minc, 1, CROP)
    cand = in_range & (props.max_r[sel_c] - minr <= CROP) & (props.max_c[sel_c] - minc <= CROP)
    if stage == "q":
        return minr.sum() + cw.sum() + cand.sum()
    padded = jnp.pad(green, ((0, CROP), (0, CROP)))
    crops = jax.vmap(
        lambda r0, c0: jax.lax.dynamic_slice(padded, (r0, c0), (CROP, CROP))
    )(minr, minc)
    if stage == "g":
        return jnp.sum(crops)
    ar = jnp.arange(CROP)
    rect = (ar[None, :, None] < ch[:, None, None]) & (ar[None, None, :] < cw[:, None, None])
    area_rect = jnp.maximum((ch * cw).astype(jnp.float32), 1.0)
    mean = jnp.sum(jnp.where(rect, crops, 0.0), axis=(1, 2)) / area_rect
    centered = jnp.where(rect, crops - mean[:, None, None], 0.0)
    std = jnp.sqrt(jnp.maximum(jnp.sum(centered * centered, axis=(1, 2)) / area_rect, 0.0))
    valid = cand & (mean >= 0.5) & (std >= 0.1)
    if stage == "s":
        return jnp.sum(crops) + mean.sum() + std.sum() + valid.sum()
    order = jnp.nonzero(valid, size=CCAP, fill_value=CCAP)[0]
    ok = order < CCAP
    o = jnp.minimum(order, CCAP - 1)
    out = crops[o]
    return jnp.sum(out) + jnp.where(ok, mean[o], 0.0).sum() + ok.sum()


def make(stage):
    @jax.jit
    def run(segs, greens):
        return jax.vmap(lambda s, g: tail(s, g, stage))(segs, greens).sum()

    return run


VARIANTS = {k: (k, make(k)) for k in "pqgsr"}

which = sys.argv[1] if len(sys.argv) > 1 else "pqgsr"
for k in which:
    name, fn = VARIANTS[k]
    t0 = time.perf_counter()
    float(fn(segs, greens))
    print(f"{name}: warm+compile {time.perf_counter()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(segs, greens))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)
