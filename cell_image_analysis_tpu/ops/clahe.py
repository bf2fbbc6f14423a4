"""Contrast-limited adaptive histogram equalization (CLAHE) on device.

TPU-native replacement for `skimage.exposure.equalize_adapthist(cell_image,
clip_limit=0.02)` (CAE_improved_modeltrain.py:92, improved_detection.py:98),
batched over capacity-padded variable-size cell crops with fully static
shapes.  The executable specification is
`cell_image_analysis_tpu.ops.oracle.clahe_np.equalize_adapthist_np`; this
kernel matches it bit-for-bit on the 14-bit quantized path.

Static-shape strategy (SURVEY.md "hard parts"):
- tile kernel k = max(1, side // 8) is *data-dependent*; the contextual-region
  grid (ns = ceil(side/k) <= 16 for any side) lives in a fixed 16x16 tile
  capacity with validity masking;
- the "virtual" pixel grid (capacity + max kernel) reflect-folds into the
  actual crop, reproducing skimage's reflect padding; on the MXU path the
  fold itself is two exact 0/1 reflection matmuls (R_y @ binned @ R_x^T) —
  vmapped 2D gathers lower to scalar loops on TPU (BENCH.md);
- per-tile histograms, the reflect fold, and the mapping interpolation are
  all one-hot MXU matmuls on the TPU path ("mxu"), with an exact
  segment-sum/gather twin ("scatter") for CPU; every combination is
  bit-identical;
- Zuiderveld clip/redistribute runs as a vmapped `lax.while_loop` whose
  residual-spread passes are the vectorized equivalent of the oracle's
  step-walk (prefix ranks via a triangular-ones matmul);
- interpolation computes D[p, t] = maps[t, bin(p)] once per block and
  contracts each of the 4 edge-clamped corner one-hots against it.
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.utils import prec

NR_OF_GRAY = 2 ** 14
NS_CAP = 16  # >= ceil(side / max(1, side//8)) for every side >= 1
# Tighter capacity when every side >= 16 (then k = side//8 >= 2 and
# ns = ceil(side/k) <= 8 + ceil(7/k) <= 12): the clip state and the
# interpolation D matrix scale with ns_cap^2 / ns_cap, so the production
# chunk loop routes min-side >= 16 cells through ns_cap=12 buckets
# (pipeline/scoring.py) — numerics are capacity-independent.
NS_CAP_16PX = 12


def _reflect(idx: jax.Array, n: jax.Array) -> jax.Array:
    """numpy.pad mode='reflect' index fold for 0 <= idx < 2n-1."""
    over = idx - (n - 1)
    idx = jnp.where(over > 0, n - 1 - over, idx)
    return jnp.clip(idx, 0, jnp.maximum(n - 1, 0))


def _clip_histogram(hist: jax.Array, clim: jax.Array, nbins: int) -> jax.Array:
    """Vectorized Zuiderveld clip + redistribute for one (nbins,) int32
    histogram; exact match of oracle.clip_histogram."""
    excess = jnp.where(hist > clim, hist - clim, 0)
    n_excess = jnp.sum(excess)
    hist = jnp.minimum(hist, clim)

    bin_incr = n_excess // nbins
    upper = clim - bin_incr
    low = hist < upper
    n_excess = n_excess - jnp.sum(low) * bin_incr
    hist = jnp.where(low, hist + bin_incr, hist)
    mid = (hist >= upper) & (hist < clim)
    n_excess = n_excess + jnp.sum(jnp.where(mid, hist - clim, 0))
    hist = jnp.where(mid, clim, hist)

    bin_ids = jnp.arange(nbins, dtype=jnp.int32)
    # rank = inclusive prefix count of eligible bins, as an f32 triangular
    # matmul instead of cumsum: ranks <= nbins are exact in f32, and the MXU
    # beats the log-depth cumsum lowering inside the vmapped while_loop
    # (~5.5 ms/batch on the bench workload; int16 state measured no better —
    # scripts/probe_chunk_body.py cl=rankmm/cl=clip16/cl=rk+i16)
    L = jnp.tril(jnp.ones((nbins, nbins), jnp.float32))

    def cond(state):
        h, ne, added = state
        return (ne > 0) & (added > 0)

    def body(state):
        h, ne, _ = state
        step = jnp.maximum(1, nbins // jnp.maximum(ne, 1))
        eligible = (h < clim) & (bin_ids % step == 0)
        rank = (eligible.astype(jnp.float32) @ L.T).astype(jnp.int32)
        add = eligible & (rank <= ne)
        h = h + add.astype(jnp.int32)
        n_added = jnp.sum(add.astype(jnp.int32))
        return h, ne - n_added, n_added

    # initial `added` derived from data (always >= 1 here) so its type is
    # device-varying under shard_map, matching the body output
    added0 = jnp.maximum(jnp.int32(1), n_excess * 0)
    hist, _, _ = jax.lax.while_loop(cond, body, (hist, n_excess, added0))
    return hist


def _split_impl(impl: str) -> tuple[str, str]:
    """impl -> (hist_impl, interp_impl).  "mxu"/"scatter" set both stages;
    "A+B" mixes (e.g. "scatter+mxu" = segment-sum histograms with one-hot
    matmul interpolation).  All combinations are bit-identical."""
    if "+" in impl:
        hist_impl, interp_impl = impl.split("+")
    else:
        hist_impl = interp_impl = impl
    assert hist_impl in ("mxu", "scatter") and interp_impl in ("mxu", "scatter"), impl
    return hist_impl, interp_impl


def _quantize14(crop: jax.Array, valid: jax.Array):
    """Step 1: min-max stretch to 14-bit gray — EXACT for integer-valued
    crops (every uint16 TIFF channel).

    The oracle quantizes in float64; doing it in f32 flips knife-edge pixels
    into the neighboring 14-bit level (~8/4096 px/cell), which shifts tile
    histograms by one count and every interpolated output in those tiles by
    ~1/16320 — measured 6e-5 on most parity cells, and the 200x
    RobustScaler/RBF amplification of that noise is what flipped the r3
    on-chip FFT parity cell (BENCH.md r3s3).  Integer-valued crops admit an
    exact path shared with the oracle: with k = v-lo and D = hi-lo exact
    int32, round_half_even(k*16383/D) = q - (tie & odd(q)) where
    q = (2*k*16383 + D) // (2*D); max 2*65535*16383 + 65535 = 65535*32767
    < 2^31.  The predicate (integer values, 0 <= v < 2^24, hi-lo <= 65535)
    is mirrored verbatim in ops/oracle/clahe_np.py so both sides always
    take the same branch.  Non-integer inputs keep the f32 estimate (the
    documented one-quantum divergence class, clahe_np.py header).

    Returns (img14 int32, lo f32, hi f32)."""
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    v = crop.astype(jnp.float32)
    lo = jnp.min(jnp.where(valid, v, big))
    hi = jnp.max(jnp.where(valid, v, -big))
    scale = jnp.where(hi > lo, (NR_OF_GRAY - 1) / (hi - lo), 0.0)
    img14_f = jnp.round((v - lo) * scale).astype(jnp.int32)

    kf = jnp.clip(v - lo, 0.0, 65535.0)  # exact for in-range integer inputs
    k = kf.astype(jnp.int32)
    D = jnp.maximum(jnp.clip(hi - lo, 0.0, 65535.0).astype(jnp.int32), 1)
    t = 2 * k * (NR_OF_GRAY - 1) + D
    q = t // (2 * D)
    tie = (t % (2 * D)) == 0
    img14_i = q - (tie & ((q % 2) == 1)).astype(jnp.int32)

    exact_ok = (jnp.all(jnp.where(valid, (v == jnp.round(v)) & (v >= 0)
                                  & (v < 16777216.0), True))
                & (hi - lo <= 65535.0) & (hi > lo))
    img14 = jnp.where(exact_ok, img14_i, img14_f)
    return jnp.where(hi > lo, img14, 0), lo, hi


def _clahe_one(
    crop: jax.Array,
    h: jax.Array,
    w: jax.Array,
    clip_limit: float,
    nbins: int,
    grid: int,
    vcap: int,
    impl: str = "scatter",
    ns_cap: int = NS_CAP,
) -> jax.Array:
    cap = crop.shape[0]
    ys = jnp.arange(cap)
    valid = (ys[:, None] < h) & (ys[None, :] < w)
    big = jnp.float32(jnp.finfo(jnp.float32).max)

    # 1. 14-bit min-max quantization over the valid region (exact-integer
    # path for integer-valued crops — see _quantize14).
    img14, lo, hi = _quantize14(crop, valid)
    bin_size = 1 + NR_OF_GRAY // nbins
    binned = jnp.clip(img14 // bin_size, 0, nbins - 1)

    kh = jnp.maximum(1, h // grid)
    kw = jnp.maximum(1, w // grid)
    ns_h = (h + kh - 1) // kh
    ns_w = (w + kw - 1) // kw

    # 2. Per-tile histograms over the virtual (reflect-folded) grid.
    # hist_impl="mxu": block-scanned one-hot matmuls — hist = T^T @ B with
    # T (block, n_tiles) and B (block, nbins) exact 0/1 bf16 one-hots and
    # float32 accumulation (counts < 2^24, so exact); measured far faster
    # than the scatter path on TPU (BENCH.md in-loop sweep).
    # hist_impl="scatter": segment-sum — faster on CPU, where XLA matmuls
    # don't pay off.
    hist_impl, interp_impl = _split_impl(impl)
    # caller contract: ns_h, ns_w <= ns_cap for every (h, w) routed here
    n_tiles = ns_cap * ns_cap
    yv = jnp.arange(vcap)
    ty = yv[:, None] // kh
    tx = yv[None, :] // kw
    vvalid = (yv[:, None] < ns_h * kh) & (yv[None, :] < ns_w * kw)
    if hist_impl == "mxu":
        # Reflect-fold via exact 0/1 reflection matrices (R_y @ binned @ R_x^T)
        # instead of a 2D gather: each output element selects exactly one
        # source value (rows of R are one-hot) and bin ids < 256 are exact in
        # f32, so this is bit-identical to the gather — and ~35 ms/batch
        # faster on TPU, where vmapped 2D gathers lower to scalar loops
        # (scripts/probe_hist_impls.py).
        Ry = (_reflect(yv, h)[:, None] == ys[None, :]).astype(jnp.float32)
        Rx = (_reflect(yv, w)[:, None] == ys[None, :]).astype(jnp.float32)
        src = jnp.round(Ry @ binned.astype(jnp.float32) @ Rx.T).astype(jnp.int32)
    else:
        src = binned[_reflect(yv, h)[:, None], _reflect(yv, w)[None, :]]
    tile_flat = (ty * ns_cap + tx).reshape(-1)
    bin_flat = src.reshape(-1)
    valid_flat = vvalid.reshape(-1)

    tile_ids = jnp.arange(n_tiles)
    bin_ids2 = jnp.arange(nbins)

    if hist_impl == "mxu":
        blk = 2048
        n_blocks = (tile_flat.shape[0] + blk - 1) // blk
        pad = n_blocks * blk - tile_flat.shape[0]
        tile_b = jnp.pad(tile_flat, (0, pad)).reshape(n_blocks, blk)
        bin_b = jnp.pad(bin_flat, (0, pad)).reshape(n_blocks, blk)
        val_b = jnp.pad(valid_flat, (0, pad)).reshape(n_blocks, blk)

        def hist_step(acc, args):
            t, b, v = args
            T = ((t[:, None] == tile_ids[None, :]) & v[:, None]).astype(jnp.bfloat16)
            Bm = (b[:, None] == bin_ids2[None, :]).astype(jnp.bfloat16)
            acc = acc + jax.lax.dot_general(
                T, Bm, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return acc, None

        hists_f, _ = jax.lax.scan(hist_step, jnp.zeros((n_tiles, nbins), jnp.float32),
                                  (tile_b, bin_b, val_b))
        hists = hists_f.astype(jnp.int32)
    else:
        n_seg = n_tiles * nbins
        seg = tile_flat * nbins + bin_flat
        seg = jnp.where(valid_flat, seg, n_seg)
        hists = jax.ops.segment_sum(
            valid_flat.astype(jnp.int32), seg, num_segments=n_seg + 1
        )[:-1].reshape(n_tiles, nbins)

    # 3. Clip + redistribute; 4. integer CDF mapping to gray levels.
    clim = jnp.maximum(1, (clip_limit * (kh * kw).astype(jnp.float32)).astype(jnp.int32))
    hists = jax.vmap(lambda hh: _clip_histogram(hh, clim, nbins))(hists)
    cdf = jnp.cumsum(hists, axis=-1)
    maps = jnp.minimum(cdf * (NR_OF_GRAY - 1) // (kh * kw), NR_OF_GRAY - 1)
    maps_f = maps.astype(jnp.float32)  # (n_tiles, nbins)

    # 5. Bilinear blend of the 4 neighboring tile mappings per pixel, again
    # as block one-hot matmuls: per corner, rows = onehot_tile @ maps picks
    # each pixel's tile mapping and the bin one-hot row-dot reads its value —
    # all MXU work instead of 4 HBM gathers per pixel.
    # EXACT-INTEGER BLEND: weights are the integer coefficient NUMERATORS
    # (ny in {kh-ay, ay}, nx in {kw-ax, ax}) carried as f32 exact integers;
    # the accumulated S = sum(ny*nx*map) <= kh*kw*16383 < 2^24 stays exact
    # in f32, and the final out = S // (kh*kw) is an int32 floor-division —
    # bit-identical to the oracle's rational floor.  The previous fractional
    # f32 blend + floor flipped one gray quantum wherever the true value sat
    # near an integer (182/14550 px at 150x97), which was the r3 parity
    # residue (VERDICT r3 item 1, BENCH.md r4s1).
    yp = ys[:, None] + kh // 2
    xp = ys[None, :] + kw // 2
    pty = yp // kh
    ptx = xp // kw
    ay = yp % kh
    ax = xp % kw

    corner_tiles = []
    corner_w = []
    for ey in (0, 1):
        my = jnp.clip(pty - 1 + ey, 0, ns_h - 1)
        ny = ay if ey else kh - ay
        for ex in (0, 1):
            mx = jnp.clip(ptx - 1 + ex, 0, ns_w - 1)
            nx = ax if ex else kw - ax
            corner_tiles.append((my * ns_cap + mx).reshape(-1))
            corner_w.append((ny * nx).reshape(-1).astype(jnp.float32))
    corner_tiles = jnp.stack(corner_tiles)   # (4, P)
    corner_w = jnp.stack(corner_w)           # (4, P) integer-valued f32
    area_i = kh * kw                         # int32 blend denominator

    # measurement knobs (VERDICT r4 item 6; read at TRACE time like the
    # other CIA_* probe knobs — each probe step runs a fresh process).
    # CIA_CLAHE_MXU_VARIANT selects the D-matmul formulation; CIA_CLAHE_SEP
    # selects the separable row/col corner contraction.  Every variant is
    # EXACT (bit-identical to the oracle) — see the notes at each branch;
    # tests/test_clahe.py parametrizes all of them against "scatter".
    mxu_variant = os.environ.get("CIA_CLAHE_MXU_VARIANT", "split")
    sep = os.environ.get("CIA_CLAHE_SEP", "0") == "1"

    if sep:
        # separable blend operands: per-pixel 2-hot x/y weight vectors.
        # EXACT despite the re-bracketing: since r4s1 every quantity is an
        # integer carried in f32 — rowv = sum_mx Wx*D <= kw * 16383 < 2^24
        # and S = sum_my Wy*rowv <= kh*kw*16383 < 2^24 (asserted in
        # clahe_cells) — so the integer result equals the 4-corner sum
        # regardless of association (BENCH.md's old "would need the oracle
        # contract relaxed" note predates the exact-integer blend).
        # Clamped edges make corners coincide; the 2-hot weights ADD at the
        # shared index, which is again the same integer sum.
        ns_ids = jnp.arange(ns_cap)
        z2 = jnp.zeros((cap, cap), jnp.int32)  # broadcast (cap,1)/(1,cap) ops
        sep_ops = [(a + z2).reshape(-1) for a in (
            jnp.clip(pty - 1, 0, ns_h - 1), jnp.clip(pty, 0, ns_h - 1),
            kh - ay, ay,
            jnp.clip(ptx - 1, 0, ns_w - 1), jnp.clip(ptx, 0, ns_w - 1),
            kw - ax, ax,
        )]

    P = cap * cap
    if interp_impl == "mxu":
        pblk = 2048
        n_pb = (P + pblk - 1) // pblk
        ppad = n_pb * pblk - P
        ct_b = jnp.pad(corner_tiles, ((0, 0), (0, ppad))).reshape(4, n_pb, pblk).transpose(1, 0, 2)
        cw_b = jnp.pad(corner_w, ((0, 0), (0, ppad))).reshape(4, n_pb, pblk).transpose(1, 0, 2)
        bin_pb = jnp.pad(binned.reshape(-1), (0, ppad)).reshape(n_pb, pblk)
        if sep:
            sep_b = jnp.stack([
                jnp.pad(a, (0, ppad)).reshape(n_pb, pblk) for a in sep_ops
            ], axis=1)                       # (n_pb, 8, pblk)
        else:
            sep_b = jnp.zeros((n_pb, 0, pblk), jnp.int32)

        def interp_step(_, args):
            ct, cw, b, sp = args             # (4, pblk), (4, pblk), (pblk,)
            # D[p, t] = maps[t, bin(p)] — ONE matmul shared by all four
            # corners (the old per-corner rows = T_c @ maps spent 4x the
            # MXU FLOPs computing all 256 bins per pixel to use one).  Each
            # corner is then a cheap one-hot contraction over tiles.
            # EXACTNESS ON TPU: the default f32 "matmul" is a SINGLE bf16
            # MXU pass — both operands are rounded to bf16 — and maps'
            # integer values reach NR_OF_GRAY-1 = 16383, far beyond bf16's
            # exact-integer range (256): measured CLAHE output deviation
            # 2.1e-3 vs the oracle (/tmp probe, BENCH.md r2s9).  Splitting
            # maps into bf16-exact parts (multiples of 64 up to 16320, and
            # a remainder < 64) makes BOTH one-pass matmuls exact — the
            # one-hot rows select single f32-accumulated entries — at 2x
            # the matmul FLOPs (vs 3x for precision="high").
            dnum = (((1,), (1,)), ((), ()))
            if prec.ablated("clahe"):        # measurement only: single pass
                Bm = (b[:, None] == bin_ids2[None, :]).astype(jnp.float32)
                D = jax.lax.dot_general(
                    Bm, maps_f, dimension_numbers=dnum,
                    preferred_element_type=jnp.float32,
                )
            elif mxu_variant == "bf16":
                # same hi/lo split with EXPLICIT bf16 operands: one-hots
                # are 0/1 (bf16-exact), maps_hi is 64*n with n <= 255 and
                # the remainder < 64 (both bf16-exact: 8-bit mantissa
                # covers integers <= 256 times a power of two), so the
                # f32-accumulated single passes are unchanged bit-for-bit
                # while the operand HBM bytes halve.
                Bm16 = (b[:, None] == bin_ids2[None, :]).astype(jnp.bfloat16)
                maps_hi = jnp.floor(maps_f * (1.0 / 64.0)) * 64.0
                D = jax.lax.dot_general(
                    Bm16, maps_hi.astype(jnp.bfloat16), dimension_numbers=dnum,
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    Bm16, (maps_f - maps_hi).astype(jnp.bfloat16),
                    dimension_numbers=dnum,
                    preferred_element_type=jnp.float32,
                )
            elif mxu_variant == "int8":
                # two base-128 digit matmuls on the int MXU path: int8
                # operands (quarter the f32 bytes), int32 accumulation —
                # exact by construction (digits <= 127, counts < 2^24).
                Bm8 = (b[:, None] == bin_ids2[None, :]).astype(jnp.int8)
                hi7 = (maps // 128).astype(jnp.int8).T
                lo7 = (maps % 128).astype(jnp.int8).T
                dnum8 = (((1,), (0,)), ((), ()))
                D = (128 * jax.lax.dot_general(
                    Bm8, hi7, dimension_numbers=dnum8,
                    preferred_element_type=jnp.int32,
                ) + jax.lax.dot_general(
                    Bm8, lo7, dimension_numbers=dnum8,
                    preferred_element_type=jnp.int32,
                )).astype(jnp.float32)
            else:
                Bm = (b[:, None] == bin_ids2[None, :]).astype(jnp.float32)
                maps_hi = jnp.floor(maps_f * (1.0 / 64.0)) * 64.0
                D = jax.lax.dot_general(
                    Bm, maps_hi, dimension_numbers=dnum,
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    Bm, maps_f - maps_hi, dimension_numbers=dnum,
                    preferred_element_type=jnp.float32,
                )                            # (pblk, n_tiles)
            if sep:
                my0b, my1b, ny0b, ny1b, mx0b, mx1b, nx0b, nx1b = (
                    sp[i] for i in range(8))
                Dr = D.reshape(D.shape[0], ns_cap, ns_cap)
                Wx = (nx0b[:, None] * (ns_ids[None, :] == mx0b[:, None])
                      + nx1b[:, None] * (ns_ids[None, :] == mx1b[:, None])
                      ).astype(jnp.float32)  # (pblk, ns_cap)
                rowv = jnp.sum(Dr * Wx[:, None, :], axis=-1)
                Wy = (ny0b[:, None] * (ns_ids[None, :] == my0b[:, None])
                      + ny1b[:, None] * (ns_ids[None, :] == my1b[:, None])
                      ).astype(jnp.float32)
                vals = jnp.sum(rowv * Wy, axis=-1)
            else:
                vals = 0.0
                for c in range(4):
                    T = (ct[c][:, None] == tile_ids[None, :]).astype(jnp.bfloat16)
                    picked = jnp.sum(T * D, axis=-1)
                    vals = vals + cw[c] * picked
            return None, vals

        _, out_blocks = jax.lax.scan(interp_step, None,
                                     (ct_b, cw_b, bin_pb, sep_b))
        S = out_blocks.reshape(-1)[:P].astype(jnp.int32)
        out = (S // area_i).reshape(cap, cap).astype(jnp.float32)
    else:
        maps_flat = maps.reshape(-1)
        bflat = binned.reshape(-1)
        out = jnp.zeros(P, jnp.float32)
        for c in range(4):
            gathered = maps_flat[corner_tiles[c] * nbins + bflat]
            out = out + corner_w[c] * gathered.astype(jnp.float32)
        out = (out.astype(jnp.int32) // area_i).reshape(cap, cap).astype(jnp.float32)

    # 6. Min-max rescale to [0, 1] over the valid region.
    lo2 = jnp.min(jnp.where(valid, out, big))
    hi2 = jnp.max(jnp.where(valid, out, -big))
    scale2 = jnp.where(hi2 > lo2, 1.0 / (hi2 - lo2), 0.0)
    return jnp.where(valid, (out - lo2) * scale2, 0.0)


@partial(jax.jit, static_argnames=("clip_limit", "nbins", "grid", "impl", "ns_cap"))
def clahe_cells(
    crops: jax.Array,
    heights: jax.Array,
    widths: jax.Array,
    clip_limit: float = 0.02,
    nbins: int = 256,
    grid: int = 8,
    impl: str = "auto",
    ns_cap: int = NS_CAP,
) -> jax.Array:
    """Batched CLAHE over capacity-padded crops.

    Args:
      crops:   (C, cap, cap) raw-intensity crops (any monotone scale — the
               algorithm min-max quantizes per crop, so uint16 TIFF counts and
               floats behave identically, matching img_as_uint + full-range
               rescale in the reference stack).
      heights/widths: (C,) int32 actual sizes.
      impl:    "mxu" (one-hot matmul histograms/interpolation — fastest on
               TPU), "scatter" (segment-sum/gather — fastest on CPU), or
               "auto" (pick by backend).  Both are bit-identical.
    Returns (C, cap, cap) float32 in [0, 1]; padding region zeroed.
    """
    if impl == "auto":
        impl = "scatter" if jax.default_backend() == "cpu" else "mxu"
    cap = crops.shape[-1]
    # exact-integer blend bound: S = kh*kw*(NR_OF_GRAY-1) must stay < 2^24
    # for f32 accumulation to be exact (kh, kw <= cap // grid)
    assert max(1, cap // grid) ** 2 * (NR_OF_GRAY - 1) < 2 ** 24, (
        f"crop capacity {cap} too large for the exact f32 integer blend"
    )
    vcap = cap + max(1, cap // grid)  # covers ceil(s/k)*k <= s + k - 1
    if impl == "pallas":
        return _clahe_cells_pallas(crops, heights, widths, clip_limit, nbins, grid, vcap)
    fn = lambda c, h, w: _clahe_one(c, h, w, clip_limit, nbins, grid, vcap, impl, ns_cap)
    return jax.vmap(fn)(crops, heights, widths)


def _clahe_cells_pallas(crops, heights, widths, clip_limit, nbins, grid, vcap):
    """impl='pallas': XLA computes the per-cell index/weight arrays (cheap
    elementwise + the reflect gather); the fused VMEM kernel
    (ops/pallas/clahe_kernel.py) does histograms, clip, CDF, interpolation."""
    from cell_image_analysis_tpu.ops.pallas.clahe_kernel import clahe_core_pallas

    cap = crops.shape[-1]
    P = cap * cap
    Pv = vcap * vcap
    Pv_pad = -(-Pv // 512) * 512
    assert P % 512 == 0, "crop capacity^2 must be a multiple of 512 for impl='pallas'"

    def prepare(crop, h, w):
        ys = jnp.arange(cap)
        valid = (ys[:, None] < h) & (ys[None, :] < w)
        img14, lo, hi = _quantize14(crop, valid)
        bin_size = 1 + NR_OF_GRAY // nbins
        binned = jnp.clip(img14 // bin_size, 0, nbins - 1)

        kh = jnp.maximum(1, h // grid)
        kw = jnp.maximum(1, w // grid)
        ns_h = (h + kh - 1) // kh
        ns_w = (w + kw - 1) // kw

        yv = jnp.arange(vcap)
        vtiles = ((yv[:, None] // kh) * NS_CAP + yv[None, :] // kw).reshape(-1)
        vvalid = ((yv[:, None] < ns_h * kh) & (yv[None, :] < ns_w * kw)).reshape(-1)
        vbins = binned[_reflect(yv, h)[:, None], _reflect(yv, w)[None, :]].reshape(-1)
        pad = Pv_pad - Pv
        vtiles = jnp.pad(vtiles, (0, pad))
        vvalid = jnp.pad(vvalid, (0, pad))
        vbins = jnp.pad(vbins, (0, pad))

        yp = ys[:, None] + kh // 2
        xp = ys[None, :] + kw // 2
        pty = yp // kh
        ptx = xp // kw
        # integer numerator weights — see _clahe_one's exact-integer blend
        ay = yp % kh
        ax = xp % kw
        tiles4, w4 = [], []
        for ey in (0, 1):
            my = jnp.clip(pty - 1 + ey, 0, ns_h - 1)
            ny = ay if ey else kh - ay
            for ex in (0, 1):
                mx = jnp.clip(ptx - 1 + ex, 0, ns_w - 1)
                nx = ax if ex else kw - ax
                tiles4.append((my * NS_CAP + mx).reshape(-1))
                w4.append((ny * nx).reshape(-1).astype(jnp.float32))
        ptiles = jnp.stack(tiles4, axis=1)  # (P, 4)
        pw = jnp.stack(w4, axis=1)
        clim = jnp.maximum(1, (clip_limit * (kh * kw).astype(jnp.float32)).astype(jnp.int32))
        area = (kh * kw).astype(jnp.float32)
        return (clim, area, vbins, vtiles, vvalid, binned.reshape(-1), ptiles, pw,
                valid, lo, hi)

    (clim, area, vbins, vtiles, vvalid, pbins, ptiles, pw, valid, lo, hi) = jax.vmap(prepare)(
        crops, heights, widths
    )
    vals = clahe_core_pallas(clim, area, vbins, vtiles, vvalid, pbins, ptiles, pw)
    out = vals.reshape(-1, cap, cap)

    big = jnp.float32(jnp.finfo(jnp.float32).max)
    lo2 = jnp.min(jnp.where(valid, out, big), axis=(1, 2), keepdims=True)
    hi2 = jnp.max(jnp.where(valid, out, -big), axis=(1, 2), keepdims=True)
    scale2 = jnp.where(hi2 > lo2, 1.0 / (hi2 - lo2), 0.0)
    return jnp.where(valid, (out - lo2) * scale2, 0.0)
