#!/usr/bin/env python
"""Decompose the label-path stage A (StarDist backend) on TPU: labels ->
regionprops_from_labels -> full extract_candidates_from_labels_runs.

The fused-bench breakdown (probe_stardist) shows stage A adding ~142 ms per
8x1024^2 batch on top of forward+NMS+raster (~99 ms); this isolates whether
the run-table scatters in regionprops_from_labels or the candidate
gather/stats dominate.

Usage: python scripts/probe_labels_props.py [batch] [size]
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.ops.extract import (
    extract_candidates_from_labels_runs,
)
from cell_image_analysis_tpu.ops.runs import regionprops_from_labels
from cell_image_analysis_tpu.utils.bench import (
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

variables = load_synthetic_unet_variables()
backend = stardist_backend(max_candidates=256, raster_patch=96,
                           raster_cap=128, runs_props=True)
cfg = backend.cfg
LCAP = cfg.raster_cap or cfg.max_candidates


def t(name, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)


@jax.jit
def a_labels(segs):
    return jax.vmap(backend)(segs)


@jax.jit
def b_props(segs):
    labels = jax.vmap(backend)(segs)
    props, ovf = jax.vmap(
        lambda lab: regionprops_from_labels(lab, capacity=LCAP, rcap=64)
    )(labels)
    return props.area


@jax.jit
def c_full(segs, greens):
    labels = jax.vmap(backend)(segs)

    def one(lab, green):
        cand, _ = extract_candidates_from_labels_runs(
            lab, green, label_capacity=LCAP, cell_capacity=128)
        return cand
    return jax.vmap(one)(labels, greens).crops


print(f"probe_labels_props: batch={BATCH} size={SIZE} lcap={LCAP}", flush=True)
t("a labels (fwd+nms+raster)", lambda: float(a_labels(segs).sum()))
t("b + regionprops_labels   ", lambda: float(b_props(segs).sum()))
t("c + full stage A         ", lambda: float(c_full(segs, greens).sum()))
