#!/usr/bin/env python
"""Probe crop-gather structures for stage A's candidate tail (~37 ms of the
88 ms stage A at rcap=32, per probe_stage_a2.py).

The production gather is a vmapped dynamic_slice of (192,192) windows from a
padded frame — 8 frames x 128 cells = 37.7M f32 elements via XLA gather.
Variants:
  v192 — production: per-frame vmapped dynamic_slice @192
  f192 — ONE fori_loop over all 1024 (frame,cell) slots: dynamic_slice from
         the stacked padded frames + dynamic_update_slice into the buffer
  v64  — vmapped dynamic_slice @64 (proxy: deferred bucketed gather traffic)
  f64  — fori_loop @64
All include one ~32 ms host fetch.
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import threshold_mask
from cell_image_analysis_tpu.ops.runs import regionprops_from_mask
from cell_image_analysis_tpu.ops.regionprops import qc_mask
from cell_image_analysis_tpu.utils.bench import _make_frames

CCAP = 128
LCAP = 4096

frames = _make_frames(8, 1024, 80)
stack = np.stack(frames)
segs = jnp.asarray(stack[..., 2].astype(np.float32))
greens = jnp.asarray(stack[..., 1].astype(np.float32))


@jax.jit
def boxes_of(segs):
    def one(seg):
        props, _ = regionprops_from_mask(threshold_mask(seg), capacity=LCAP, rcap=32)
        geo = qc_mask(props, jnp.int32(seg.shape[0]), jnp.int32(seg.shape[1]))
        sel = jnp.nonzero(geo, size=CCAP, fill_value=LCAP)[0]
        sel_c = jnp.minimum(sel, LCAP - 1)
        return props.min_r[sel_c], props.min_c[sel_c], sel < LCAP

    return jax.vmap(one)(segs)


minr, minc, ok = boxes_of(segs)


def make_vmapped(cap):
    @jax.jit
    def run(greens, minr, minc):
        def per_frame(green, mr, mc):
            padded = jnp.pad(green, ((0, cap), (0, cap)))
            return jax.vmap(
                lambda r0, c0: jax.lax.dynamic_slice(padded, (r0, c0), (cap, cap))
            )(mr, mc)

        crops = jax.vmap(per_frame)(greens, minr, minc)
        return jnp.sum(crops)

    return run


def make_fori(cap):
    @jax.jit
    def run(greens, minr, minc):
        padded = jnp.pad(greens, ((0, 0), (0, cap), (0, cap)))
        mr = minr.reshape(-1)
        mc = minc.reshape(-1)
        n = mr.shape[0]
        out = jnp.zeros((n, cap, cap), jnp.float32)

        def step(i, out):
            sl = jax.lax.dynamic_slice(
                padded, (i // CCAP, mr[i], mc[i]), (1, cap, cap))
            return jax.lax.dynamic_update_slice(out, sl, (i, 0, 0))

        out = jax.lax.fori_loop(0, n, step, out)
        return jnp.sum(out)

    return run


VARIANTS = dict(
    a=("v192", make_vmapped(192)),
    b=("f192", make_fori(192)),
    c=("v64 ", make_vmapped(64)),
    d=("f64 ", make_fori(64)),
)

which = sys.argv[1] if len(sys.argv) > 1 else "abcd"
for k in which:
    name, fn = VARIANTS[k]
    t0 = time.perf_counter()
    float(fn(greens, minr, minc))
    print(f"{name}: warm+compile {time.perf_counter()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(greens, minr, minc))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)
