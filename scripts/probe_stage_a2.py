#!/usr/bin/env python
"""Cumulative ablation of the production run-length stage A at the current
rcap default: run_table -> +cc_runs -> +regionprops_from_mask ->
+extract_candidates_from_mask (crop gather etc.).  All vmapped over the
8-frame bench batch; each timing includes one ~32 ms host fetch.

Usage: python scripts/probe_stage_a2.py [tcpe]
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import threshold_mask
from cell_image_analysis_tpu.ops.extract import extract_candidates_from_mask
from cell_image_analysis_tpu.ops.runs import cc_runs, regionprops_from_mask, run_table
from cell_image_analysis_tpu.utils.bench import _make_frames

RCAP = 32
KW = dict(label_capacity=4096, cell_capacity=128)

frames = _make_frames(8, 1024, 80)
stack = np.stack(frames)
segs = jnp.asarray(stack[..., 2].astype(np.float32))
greens = jnp.asarray(stack[..., 1].astype(np.float32))


@jax.jit
def masks_of(segs):
    return jax.vmap(threshold_mask)(segs)


masks = masks_of(segs)


@jax.jit
def tbl(masks):
    t = jax.vmap(lambda m: run_table(m, rcap=RCAP))(masks)
    return t.start.sum() + t.end.sum()


@jax.jit
def cc(masks):
    def one(m):
        t = run_table(m, rcap=RCAP)
        return cc_runs(t).sum()

    return jax.vmap(one)(masks).sum()


@jax.jit
def props(masks):
    def one(m):
        p, _ = regionprops_from_mask(m, capacity=4096, rcap=RCAP)
        return p.area.sum() + p.eccentricity.sum()

    return jax.vmap(one)(masks).sum()


@jax.jit
def cand(segs, greens):
    def one(seg, green):
        c, _ = extract_candidates_from_mask(threshold_mask(seg), green, **KW)
        return c.crops.sum() + c.valid.sum()

    return jax.vmap(one)(segs, greens).sum()


VARIANTS = dict(
    t=("run_table      ", lambda: float(tbl(masks))),
    c=("+cc_runs       ", lambda: float(cc(masks))),
    p=("+regionprops   ", lambda: float(props(masks))),
    e=("+extract(cand) ", lambda: float(cand(segs, greens))),
)

which = sys.argv[1] if len(sys.argv) > 1 else "tcpe"
for k in which:
    name, fn = VARIANTS[k]
    t0 = time.perf_counter()
    fn()
    print(f"{name}: warm+compile {time.perf_counter()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)
