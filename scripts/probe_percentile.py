#!/usr/bin/env python
"""Probe percentile strategies for threshold_mask (~35 ms of stage A: TWO
full 1M-element sorts per frame — probe_cand_tail.py vs probe_stage_a2.py).

Variants (all over the 8x1024^2 bench batch, one ~32 ms fetch):
  a  current threshold_mask (normalize sort + threshold sort + opening)
  n  normalize_percentile only (ONE sort) — sort cost by difference
  o  threshold_mask without opening — opening cost by difference
  s  single-sort: p3/p99.8/p90 order stats from ONE sort of x; the p90
     threshold of the normalized array is the monotone affine transform of
     x's order stats (bit-identical: the transform is elementwise-monotone
     and lerp commutes)
  b  bisection: NO sorts — exact kth order stats by 32-step binary search
     on the order-preserving uint32 mapping of float32, all 6 ranks
     counted in one fused pass per step
"""
import os, sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import binary_opening, threshold_mask
from cell_image_analysis_tpu.ops.percentile import normalize_percentile
from cell_image_analysis_tpu.utils.bench import _make_frames

frames = _make_frames(8, 1024, 80)
stack = np.stack(frames)
segs = jnp.asarray(stack[..., 2].astype(np.float32))

EPS = 1e-20


def _ranks(n, qs):
    out = []
    for q in qs:
        idx = q / 100.0 * (n - 1)
        out.append((int(np.floor(idx)), int(np.ceil(idx)), idx - np.floor(idx)))
    return out


def mask_single_sort(seg):
    x = seg.astype(jnp.float32)
    n = x.size
    xs = jnp.sort(x.reshape(-1))
    (l3, h3, f3), (l998, h998, f998), (l90, h90, f90) = _ranks(n, [3.0, 99.8, 90.0])
    lo = xs[l3] * (1 - f3) + xs[h3] * f3
    hi = xs[l998] * (1 - f998) + xs[h998] * f998
    norm = (x - lo) / (hi - lo + EPS)
    g = lambda v: (v - lo) / (hi - lo + EPS)
    thresh = g(xs[l90]) * (1 - f90) + g(xs[h90]) * f90
    return binary_opening(norm > thresh)


def _kth_bisect(u, ks):
    """Exact k-th smallest uint32 values (ks static list) of flat u via
    32-step bisection; counts for all ks share one pass per step."""
    ks = jnp.asarray(ks, jnp.uint32)[:, None]
    lo = jnp.zeros((len(ks), 1), jnp.uint32)
    hi = jnp.full((len(ks), 1), jnp.uint32(0xFFFFFFFF))

    def step(_, state):
        lo, hi = state
        mid = lo + (hi - lo) // 2
        # count of elements <= mid, per rank, one fused pass over u
        cnt = jnp.sum((u[None, :] <= mid).astype(jnp.uint32), axis=1, keepdims=True)
        take_lo = cnt > ks  # kth (0-based) is <= mid
        hi = jnp.where(take_lo, mid, hi)
        lo = jnp.where(take_lo, lo, mid + 1)
        return lo, hi

    lo, _ = jax.lax.fori_loop(0, 32, step, (lo, hi))
    return lo[:, 0]


def _f2u(x):
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(b >> 31 == 0, b | jnp.uint32(0x80000000), ~b)


def _u2f(u):
    b = jnp.where(u >> 31 == 1, u & jnp.uint32(0x7FFFFFFF), ~u)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def mask_bisect(seg):
    x = seg.astype(jnp.float32)
    n = x.size
    u = _f2u(x.reshape(-1))
    rk = _ranks(n, [3.0, 99.8, 90.0])
    ks = [r[0] for r in rk] + [r[1] for r in rk]
    vals = _u2f(_kth_bisect(u, ks))
    v = {k: vals[i] for i, k in enumerate(ks[:3])}
    v2 = {k: vals[3 + i] for i, k in enumerate(ks[3:])}
    (l3, h3, f3), (l998, h998, f998), (l90, h90, f90) = rk
    lo = v[l3] * (1 - f3) + v2[h3] * f3
    hi = v[l998] * (1 - f998) + v2[h998] * f998
    norm = (x - lo) / (hi - lo + EPS)
    g = lambda t: (t - lo) / (hi - lo + EPS)
    thresh = g(v[l90]) * (1 - f90) + g(v2[h90]) * f90
    return binary_opening(norm > thresh)


@jax.jit
def cur(segs):
    return jax.vmap(threshold_mask)(segs).sum()


@jax.jit
def norm_only(segs):
    return jax.vmap(normalize_percentile)(segs).sum()


@jax.jit
def no_open(segs):
    return jax.vmap(lambda s: threshold_mask(s, opening=False))(segs).sum()


@jax.jit
def single(segs):
    return jax.vmap(mask_single_sort)(segs).sum()


@jax.jit
def bisect(segs):
    return jax.vmap(mask_bisect)(segs).sum()


# exactness: both variants must reproduce threshold_mask bit-for-bit
@jax.jit
def masks3(segs):
    return (jax.vmap(threshold_mask)(segs),
            jax.vmap(mask_single_sort)(segs),
            jax.vmap(mask_bisect)(segs))


VARIANTS = dict(
    a=("current 2-sort ", lambda: float(cur(segs))),
    n=("normalize-only ", lambda: float(norm_only(segs))),
    o=("no-opening     ", lambda: float(no_open(segs))),
    s=("single-sort    ", lambda: float(single(segs))),
    b=("bisect-select  ", lambda: float(bisect(segs))),
)

which = sys.argv[1] if len(sys.argv) > 1 else "anosb"
if which == "check":
    m0, m1, m2 = masks3(segs)
    m0, m1, m2 = np.asarray(m0), np.asarray(m1), np.asarray(m2)
    print("single-sort identical:", bool((m0 == m1).all()),
          "bisect identical:", bool((m0 == m2).all()), flush=True)
    sys.exit(0)

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
