#!/usr/bin/env python
"""How many Zuiderveld while-loop iterations does the production clip
actually run, and what does each cost?

Builds the bench pool's per-chunk histograms (exactly as _clahe_one does),
then (a) reports the max/mean converged iteration count per chunk, and
(b) times fixed-iteration fori_loop clips at 1/2/4/8 iterations to get the
per-iteration cost (timing-only; semantics need the data-dependent while).
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import threshold_mask
from cell_image_analysis_tpu.ops.clahe import NR_OF_GRAY, NS_CAP, _reflect
from cell_image_analysis_tpu.ops.extract import extract_candidates_from_mask
from cell_image_analysis_tpu.utils.bench import _make_frames

CHUNK = 32
NBINS = 256
GRID = 8
KW = dict(label_capacity=4096, cell_capacity=128)

frames = _make_frames(8, 1024, 80)
stack = np.stack(frames)
segs = jnp.asarray(stack[..., 2].astype(np.float32))
greens = jnp.asarray(stack[..., 1].astype(np.float32))


@jax.jit
def stage_a(segs, greens):
    def one(seg, green):
        cand, _ = extract_candidates_from_mask(threshold_mask(seg), green, **KW)
        return cand.crops, cand.heights, cand.widths, cand.valid

    return jax.vmap(one)(segs, greens)


crops, heights, widths, valid = stage_a(segs, greens)
full_cap = crops.shape[-1]
crops = crops.reshape(-1, full_cap, full_cap)[:, :64, :64]
heights = jnp.minimum(heights.reshape(-1), 64)
widths = jnp.minimum(widths.reshape(-1), 64)


def hists_of(crop, h, w):
    cap = 64
    vcap = cap + cap // GRID
    ys = jnp.arange(cap)
    vmask = (ys[:, None] < h) & (ys[None, :] < w)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    v = crop.astype(jnp.float32)
    lo = jnp.min(jnp.where(vmask, v, big))
    hi = jnp.max(jnp.where(vmask, v, -big))
    scale = jnp.where(hi > lo, (NR_OF_GRAY - 1) / (hi - lo), 0.0)
    img14 = jnp.round((v - lo) * scale).astype(jnp.int32)
    binned = jnp.clip(img14 // (1 + NR_OF_GRAY // NBINS), 0, NBINS - 1)
    kh = jnp.maximum(1, h // GRID)
    kw = jnp.maximum(1, w // GRID)
    ns_h = (h + kh - 1) // kh
    ns_w = (w + kw - 1) // kw
    yv = jnp.arange(vcap)
    ty = yv[:, None] // kh
    tx = yv[None, :] // kw
    vvalid = (yv[:, None] < ns_h * kh) & (yv[None, :] < ns_w * kw)
    src = binned[_reflect(yv, h)[:, None], _reflect(yv, w)[None, :]]
    seg = jnp.where(vvalid, ty * NS_CAP + tx, NS_CAP * NS_CAP).reshape(-1) * NBINS + \
        jnp.where(vvalid, src, 0).reshape(-1)
    hists = jax.ops.segment_sum(
        jnp.ones_like(seg), seg, num_segments=(NS_CAP * NS_CAP + 1) * NBINS
    )[: NS_CAP * NS_CAP * NBINS].reshape(NS_CAP * NS_CAP, NBINS)
    clim = jnp.maximum(1, (0.02 * (kh * kw).astype(jnp.float32)).astype(jnp.int32))
    return hists, clim


@jax.jit
def all_hists(crops, heights, widths):
    return jax.vmap(hists_of)(crops, heights, widths)


hists, clims = all_hists(crops, heights, widths)


def clip_count(hist, clim):
    excess = jnp.where(hist > clim, hist - clim, 0)
    n_excess = jnp.sum(excess)
    hist = jnp.minimum(hist, clim)
    bin_incr = n_excess // NBINS
    upper = clim - bin_incr
    low = hist < upper
    n_excess = n_excess - jnp.sum(low) * bin_incr
    hist = jnp.where(low, hist + bin_incr, hist)
    mid = (hist >= upper) & (hist < clim)
    n_excess = n_excess + jnp.sum(jnp.where(mid, hist - clim, 0))
    hist = jnp.where(mid, clim, hist)
    bin_ids = jnp.arange(NBINS, dtype=jnp.int32)

    def cond(st):
        h, ne, added, it = st
        return (ne > 0) & (added > 0)

    def body(st):
        h, ne, _, it = st
        step = jnp.maximum(1, NBINS // jnp.maximum(ne, 1))
        eligible = (h < clim) & (bin_ids % step == 0)
        rank = jnp.cumsum(eligible.astype(jnp.int32))
        add = eligible & (rank <= ne)
        h = h + add.astype(jnp.int32)
        n_added = jnp.sum(add.astype(jnp.int32))
        return h, ne - n_added, n_added, it + 1

    _, _, _, iters = jax.lax.while_loop(
        cond, body, (hist, n_excess, jnp.maximum(1, n_excess * 0), 0))
    return iters


@jax.jit
def iter_counts(hists, clims):
    return jax.vmap(lambda hh, cl: jax.vmap(lambda h: clip_count(h, cl))(hh))(hists, clims)


it = np.asarray(iter_counts(hists, clims))
print(f"clip iterations: max={it.max()} mean={it.mean():.2f} "
      f"p99={np.percentile(it, 99):.0f} (over {it.size} tile-hists)", flush=True)
# distribution of per-CELL max (the vmapped while runs to the max over the chunk)
cell_max = it.max(axis=1)
print(f"per-cell max: max={cell_max.max()} mean={cell_max.mean():.2f}", flush=True)
chunks = cell_max[: (cell_max.size // CHUNK) * CHUNK].reshape(-1, CHUNK)
print(f"per-chunk max: {chunks.max(axis=1)}", flush=True)
