#!/usr/bin/env python
"""Standalone microbench of the CLAHE per-tile histogram stage (~53 ms of
the 131 ms chunk loop, per probe_clahe_stages.py).

Reproduces the production shape: 17 chunks of 32 cells (14 at cap 64,
2 at cap 96, 1 at cap 192 -> modelled here as the 64-cap stream which
dominates), each cell a [vcap, vcap] virtual grid of (tile, bin) pairs,
histogrammed into (256 tiles, 256 bins).

Variants:
  base   — production: blk-2048 scan of bf16 one-hot matmuls
  unroll — same matmuls, python-unrolled (no lax.scan)
  one    — single padded [6144] block, one matmul (no scan)
  i8     — int8 one-hots, int32 accumulation
  f32    — float32 one-hots (bf16-conversion cost by difference)
  nogat  — base, but tile/bin streams precomputed (reflect-gather cost
           by difference; NOT semantically equivalent, timing only)
All run under a fori_loop over 17 chunks to match the production context;
timings include one ~34 ms host fetch.
"""
import os, sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.ops.clahe import NS_CAP, _reflect

CAP = 64
VCAP = CAP + CAP // 8  # 72
CHUNK = 32
N_CHUNKS = int(os.environ.get("PROBE_CHUNKS", "17"))
NBINS = 256
N_TILES = NS_CAP * NS_CAP
PV = VCAP * VCAP  # 5184

rng = np.random.default_rng(0)
crops = jnp.asarray(rng.uniform(0, 3000, size=(N_CHUNKS * CHUNK, CAP, CAP)).astype(np.float32))
heights = jnp.asarray(rng.integers(20, CAP + 1, size=N_CHUNKS * CHUNK).astype(np.int32))
widths = jnp.asarray(rng.integers(20, CAP + 1, size=N_CHUNKS * CHUNK).astype(np.int32))

tile_ids = jnp.arange(N_TILES)
bin_ids = jnp.arange(NBINS)


def streams(crop, h, w):
    """quantize + reflect-fold into (tile, bin, valid) flat streams."""
    ys = jnp.arange(CAP)
    valid = (ys[:, None] < h) & (ys[None, :] < w)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    v = crop.astype(jnp.float32)
    lo = jnp.min(jnp.where(valid, v, big))
    hi = jnp.max(jnp.where(valid, v, -big))
    scale = jnp.where(hi > lo, (2 ** 14 - 1) / (hi - lo), 0.0)
    img14 = jnp.round((v - lo) * scale).astype(jnp.int32)
    binned = jnp.clip(img14 // (1 + 2 ** 14 // NBINS), 0, NBINS - 1)
    kh = jnp.maximum(1, h // 8)
    kw = jnp.maximum(1, w // 8)
    ns_h = (h + kh - 1) // kh
    ns_w = (w + kw - 1) // kw
    yv = jnp.arange(VCAP)
    ty = yv[:, None] // kh
    tx = yv[None, :] // kw
    vvalid = (yv[:, None] < ns_h * kh) & (yv[None, :] < ns_w * kw)
    src = binned[_reflect(yv, h)[:, None], _reflect(yv, w)[None, :]]
    return (ty * NS_CAP + tx).reshape(-1), src.reshape(-1), vvalid.reshape(-1)


def streams_mm(crop, h, w):
    """Same as streams() but the reflect fold is two one-hot matmuls
    (R_y @ binned @ R_x^T) instead of a 2D gather — bit-identical: the
    reflection matrices are exact 0/1 and counts stay < 2^24 in f32."""
    ys = jnp.arange(CAP)
    valid = (ys[:, None] < h) & (ys[None, :] < w)
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    v = crop.astype(jnp.float32)
    lo = jnp.min(jnp.where(valid, v, big))
    hi = jnp.max(jnp.where(valid, v, -big))
    scale = jnp.where(hi > lo, (2 ** 14 - 1) / (hi - lo), 0.0)
    img14 = jnp.round((v - lo) * scale).astype(jnp.int32)
    binned = jnp.clip(img14 // (1 + 2 ** 14 // NBINS), 0, NBINS - 1)
    kh = jnp.maximum(1, h // 8)
    kw = jnp.maximum(1, w // 8)
    ns_h = (h + kh - 1) // kh
    ns_w = (w + kw - 1) // kw
    yv = jnp.arange(VCAP)
    ty = yv[:, None] // kh
    tx = yv[None, :] // kw
    vvalid = (yv[:, None] < ns_h * kh) & (yv[None, :] < ns_w * kw)
    Ry = (_reflect(yv, h)[:, None] == ys[None, :]).astype(jnp.float32)  # (VCAP, CAP)
    Rx = (_reflect(yv, w)[:, None] == ys[None, :]).astype(jnp.float32)
    src = jnp.round(Ry @ binned.astype(jnp.float32) @ Rx.T).astype(jnp.int32)
    return (ty * NS_CAP + tx).reshape(-1), src.reshape(-1), vvalid.reshape(-1)


def hist_matmul(t, b, v, blk, dtype, scan):
    n_blocks = (PV + blk - 1) // blk
    pad = n_blocks * blk - PV
    t = jnp.pad(t, (0, pad)).reshape(n_blocks, blk)
    b = jnp.pad(b, (0, pad)).reshape(n_blocks, blk)
    v = jnp.pad(v, (0, pad)).reshape(n_blocks, blk)
    acc_t = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def step(acc, args):
        tt, bb, vv = args
        T = ((tt[:, None] == tile_ids[None, :]) & vv[:, None]).astype(dtype)
        Bm = (bb[:, None] == bin_ids[None, :]).astype(dtype)
        return acc + jax.lax.dot_general(
            T, Bm, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=acc_t,
        ), None

    acc0 = jnp.zeros((N_TILES, NBINS), acc_t)
    if scan:
        out, _ = jax.lax.scan(step, acc0, (t, b, v))
    else:
        out = acc0
        for i in range(n_blocks):
            out, _ = step(out, (t[i], b[i], v[i]))
    return out.astype(jnp.float32)


def make_variant(blk, dtype, scan, pregather=False):
    if pregather is True:
        tb, bb, vb = jax.jit(jax.vmap(streams))(crops, heights, widths)

        def run():
            def chunk_step(i, acc):
                sl = lambda a: jax.lax.dynamic_slice(
                    a, (i * CHUNK, 0), (CHUNK, PV))
                h = jax.vmap(lambda t, b, v: hist_matmul(t, b, v, blk, dtype, scan))(
                    sl(tb), sl(bb), sl(vb))
                return acc + jnp.sum(h)

            return jax.lax.fori_loop(0, N_CHUNKS, chunk_step, jnp.float32(0))

        return jax.jit(run)

    stream_fn = streams_mm if pregather == "mm" else streams

    def run():
        def chunk_step(i, acc):
            c = jax.lax.dynamic_slice(crops, (i * CHUNK, 0, 0), (CHUNK, CAP, CAP))
            h = jax.lax.dynamic_slice(heights, (i * CHUNK,), (CHUNK,))
            w = jax.lax.dynamic_slice(widths, (i * CHUNK,), (CHUNK,))

            def one(cc, hh, ww):
                t, b, v = stream_fn(cc, hh, ww)
                return hist_matmul(t, b, v, blk, dtype, scan)

            return acc + jnp.sum(jax.vmap(one)(c, h, w))

        return jax.lax.fori_loop(0, N_CHUNKS, chunk_step, jnp.float32(0))

    return jax.jit(run)


VARIANTS = dict(
    b=("base blk2048 scan bf16", make_variant(2048, jnp.bfloat16, True)),
    u=("unroll blk2048 bf16   ", make_variant(2048, jnp.bfloat16, False)),
    o=("one blk6144 bf16      ", make_variant(6144, jnp.bfloat16, False)),
    i=("i8 blk2048 scan       ", make_variant(2048, jnp.int8, True)),
    f=("f32 blk2048 scan      ", make_variant(2048, jnp.float32, True)),
    g=("pregathered streams   ", make_variant(2048, jnp.bfloat16, True, pregather=True)),
    r=("reflect-matmul bf16   ", make_variant(2048, jnp.bfloat16, True, pregather="mm")),
)

which = sys.argv[1] if len(sys.argv) > 1 else "buoifg"
for k in which:
    name, fn = VARIANTS[k]
    t0 = time.perf_counter()
    float(fn())
    print(f"{name}: warm+compile {time.perf_counter()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)
