#!/usr/bin/env python
"""Isolate WHERE the ~90 ms of CLAHE goes inside the fused chunk loop
(probe_chunk_body.py: full 131 / noclahe 41 / floor 32 ms).

Rebuilds the production loop (3 buckets, chunk 32) with partial CLAHE
bodies, cumulative by stage:
  q  quantize+bin only
  h  + per-tile histograms (mxu one-hot matmul scan)
  c  + Zuiderveld clip/redistribute (vmapped while_loop)
  m  + CDF -> mapping tables
  i  + 4-corner interpolation (mxu)          == full CLAHE minus rescale
  n  quantize+hist+CDF+interp WITHOUT clip   (clip cost by difference)
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import threshold_mask
from cell_image_analysis_tpu.ops.clahe import (
    NR_OF_GRAY, NS_CAP, _clip_histogram, _reflect,
)
from cell_image_analysis_tpu.ops.extract import extract_candidates_from_mask
from cell_image_analysis_tpu.utils.bench import _fit_params, _make_frames

CHUNK = 32
KW = dict(label_capacity=4096, cell_capacity=128)
NBINS = 256
GRID = 8

_, _, _ = _fit_params()  # keep workload identical (artifact fit not timed)
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
B, ccap, full_cap = crops.shape[0], crops.shape[1], crops.shape[-1]
N = B * ccap
crops = crops.reshape(N, full_cap, full_cap)
heights = heights.reshape(-1)
widths = widths.reshape(-1)
valid = valid.reshape(-1)
pad_len = (-(-N // CHUNK)) * CHUNK


def bucket_dev(mask):
    idx = jnp.nonzero(mask, size=N, fill_value=N)[0]
    return jnp.pad(idx, (0, pad_len - N), constant_values=N), jnp.sum(mask.astype(jnp.int32))


fits64 = (heights <= 64) & (widths <= 64)
fits96 = (heights <= 96) & (widths <= 96)
BUCKETS = (
    bucket_dev(valid & fits64) + (64,),
    bucket_dev(valid & fits96 & ~fits64) + (96,),
    bucket_dev(valid & ~fits96) + (full_cap,),
)


def clahe_partial(crop, h, w, stages, do_clip=True):
    """_clahe_one (impl='mxu') truncated after `stages`."""
    cap = crop.shape[0]
    vcap = cap + max(1, cap // GRID)
    ys = jnp.arange(cap)
    valid = (ys[:, None] < h) & (ys[None, :] < w)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    v = crop.astype(jnp.float32)
    lo = jnp.min(jnp.where(valid, v, big))
    hi = jnp.max(jnp.where(valid, v, -big))
    scale = jnp.where(hi > lo, (NR_OF_GRAY - 1) / (hi - lo), 0.0)
    img14 = jnp.round((v - lo) * scale).astype(jnp.int32)
    bin_size = 1 + NR_OF_GRAY // NBINS
    binned = jnp.clip(img14 // bin_size, 0, NBINS - 1)
    if stages == "q":
        return jnp.sum(binned.astype(jnp.float32))

    kh = jnp.maximum(1, h // GRID)
    kw = jnp.maximum(1, w // GRID)
    ns_h = (h + kh - 1) // kh
    ns_w = (w + kw - 1) // kw
    n_tiles = NS_CAP * NS_CAP
    yv = jnp.arange(vcap)
    ty = yv[:, None] // kh
    tx = yv[None, :] // kw
    vvalid = (yv[:, None] < ns_h * kh) & (yv[None, :] < ns_w * kw)
    src = binned[_reflect(yv, h)[:, None], _reflect(yv, w)[None, :]]
    tile_flat = (ty * NS_CAP + tx).reshape(-1)
    bin_flat = src.reshape(-1)
    valid_flat = vvalid.reshape(-1)
    tile_ids = jnp.arange(n_tiles)
    bin_ids2 = jnp.arange(NBINS)

    blk = 2048
    n_blocks = (tile_flat.shape[0] + blk - 1) // blk
    pad = n_blocks * blk - tile_flat.shape[0]
    tile_b = jnp.pad(tile_flat, (0, pad)).reshape(n_blocks, blk)
    bin_b = jnp.pad(bin_flat, (0, pad)).reshape(n_blocks, blk)
    val_b = jnp.pad(valid_flat, (0, pad)).reshape(n_blocks, blk)

    def hist_step(acc, args):
        t, b, vv = args
        T = ((t[:, None] == tile_ids[None, :]) & vv[:, None]).astype(jnp.bfloat16)
        Bm = (b[:, None] == bin_ids2[None, :]).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(
            T, Bm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ), None

    hists_f, _ = jax.lax.scan(hist_step, jnp.zeros((n_tiles, NBINS), jnp.float32),
                              (tile_b, bin_b, val_b))
    hists = hists_f.astype(jnp.int32)
    if stages == "h":
        return jnp.sum(hists.astype(jnp.float32))

    clim = jnp.maximum(1, (0.02 * (kh * kw).astype(jnp.float32)).astype(jnp.int32))
    if do_clip:
        hists = jax.vmap(lambda hh: _clip_histogram(hh, clim, NBINS))(hists)
    if stages == "c":
        return jnp.sum(hists.astype(jnp.float32))

    cdf = jnp.cumsum(hists, axis=-1)
    maps = jnp.minimum(cdf * (NR_OF_GRAY - 1) // (kh * kw), NR_OF_GRAY - 1)
    maps_f = maps.astype(jnp.float32)
    if stages == "m":
        return jnp.sum(maps_f)

    yp = ys[:, None] + kh // 2
    xp = ys[None, :] + kw // 2
    pty = yp // kh
    ptx = xp // kw
    cy = (yp % kh).astype(jnp.float32) / kh.astype(jnp.float32)
    cx = (xp % kw).astype(jnp.float32) / kw.astype(jnp.float32)
    corner_tiles, corner_w = [], []
    for ey in (0, 1):
        my = jnp.clip(pty - 1 + ey, 0, ns_h - 1)
        wy = cy if ey else 1.0 - cy
        for ex in (0, 1):
            mx = jnp.clip(ptx - 1 + ex, 0, ns_w - 1)
            wx = cx if ex else 1.0 - cx
            corner_tiles.append((my * NS_CAP + mx).reshape(-1))
            corner_w.append((wy * wx).reshape(-1))
    corner_tiles = jnp.stack(corner_tiles)
    corner_w = jnp.stack(corner_w)

    P = cap * cap
    pblk = 2048
    n_pb = (P + pblk - 1) // pblk
    ppad = n_pb * pblk - P
    ct_b = jnp.pad(corner_tiles, ((0, 0), (0, ppad))).reshape(4, n_pb, pblk).transpose(1, 0, 2)
    cw_b = jnp.pad(corner_w, ((0, 0), (0, ppad))).reshape(4, n_pb, pblk).transpose(1, 0, 2)
    bin_pb = jnp.pad(binned.reshape(-1), (0, ppad)).reshape(n_pb, pblk)

    def interp_step(_, args):
        ct, cw, b = args
        Bm = (b[:, None] == bin_ids2[None, :]).astype(jnp.float32)
        vals = 0.0
        for c in range(4):
            T = (ct[c][:, None] == tile_ids[None, :]).astype(jnp.bfloat16)
            rows = jax.lax.dot_general(
                T, maps_f, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vals = vals + cw[c] * jnp.sum(rows * Bm, axis=-1)
        return None, vals

    _, out_blocks = jax.lax.scan(interp_step, None, (ct_b, cw_b, bin_pb))
    return jnp.sum(out_blocks)


def make_loop(stages, do_clip=True):
    def run_all():
        out = jnp.zeros((pad_len // CHUNK * 3,), jnp.float32)

        def run(out, idx_arr, n, cap_b, slab0):
            def step(i, out):
                ids = jax.lax.dynamic_slice(idx_arr, (i * CHUNK,), (CHUNK,))
                ids_c = jnp.minimum(ids, N - 1)
                c = crops[ids_c][:, :cap_b, :cap_b]
                h = heights[ids_c]
                w = widths[ids_c]
                s = jnp.sum(jax.vmap(
                    lambda cc, hh, ww: clahe_partial(cc, hh, ww, stages, do_clip)
                )(c, h, w))
                return out.at[slab0 + i].add(s)

            return jax.lax.fori_loop(0, (n + CHUNK - 1) // CHUNK, step, out)

        for j, (idx_arr, n, cap_b) in enumerate(BUCKETS):
            out = run(out, idx_arr, n, cap_b, j * (pad_len // CHUNK))
        return out

    return run_all


VARIANTS = dict(
    q=("quant          ", jax.jit(make_loop("q"))),
    h=("+hist          ", jax.jit(make_loop("h"))),
    c=("+clip          ", jax.jit(make_loop("c"))),
    m=("+maps          ", jax.jit(make_loop("m"))),
    i=("+interp (full) ", jax.jit(make_loop("i"))),
    n=("noclip full    ", jax.jit(make_loop("i", do_clip=False))),
)

which = sys.argv[1] if len(sys.argv) > 1 else "qhcmin"
for k in which:
    name, fn = VARIANTS[k]
    t0 = time.perf_counter()
    float(fn().sum())
    print(f"{name}: warm+compile {time.perf_counter()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn().sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)
