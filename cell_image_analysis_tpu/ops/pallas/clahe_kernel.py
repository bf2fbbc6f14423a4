"""Pallas TPU kernel: fused per-cell CLAHE core.

The XLA CLAHE (ops/clahe.py impl="mxu") runs the histogram and interpolation
as block-scanned one-hot matmuls whose intermediates round-trip HBM between
scan steps.  This kernel fuses the whole per-cell core in VMEM — grid =
(cells,), one program per cell:

  inputs (all precomputed by cheap XLA elementwise code, so no dynamic
  gathers happen inside the kernel; every array is laid out (rows, 128) —
  flat (P, 1)/(P, 4) layouts pad the lane dim 128x and OOM scoped VMEM):
    vbins  (Rv, 128)    int32  bin of each virtual-grid pixel (reflect-folded)
    vtiles (Rv, 128)    int32  tile id of each virtual-grid pixel
    vvalid (Rv, 128)    int32  virtual-grid validity
    pbins  (Rp, 128)    int32  bin of each output pixel
    ptiles (4, Rp, 128) int32  the 4 corner tile ids per output pixel
    pw     (4, Rp, 128) f32    the 4 bilinear corner weight NUMERATORS
                               (integer-valued; denominator = area)
    clim   (1, 1)       int32  clip limit (counts)   [SMEM]
    area   (1, 1)       f32    kernel tile area kh*kw [SMEM]
  output:
    vals   (Rp, 128)    f32    blended mapped gray values (pre min-max rescale)

  stages in VMEM: one-hot batched-matmul histograms (n_tiles=256 lanes —
  MXU-sized), Zuiderveld clip/redistribute (vectorized while loop over the
  (256, 256) hist table; cumsums as triangular MXU matmuls — Pallas TPU has
  no cumsum lowering), integer CDF mapping, and 4-corner interpolation as
  (blk, 256) @ (256 tiles, 256 bins) contractions with bin-one-hot dots.

Semantics are identical to ops/clahe.py (same oracle tests drive both).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cell_image_analysis_tpu.utils import prec

NS_CAP = 16
N_TILES = NS_CAP * NS_CAP
NBINS = 256
NR_OF_GRAY = 2 ** 14
_VROWS = 4   # (4, 128) virtual-grid pixel rows per histogram step
_PROWS = 4   # (4, 128) output pixel rows per interpolation step


def _row_cumsum(x):
    """Inclusive row cumsum of a (T, NBINS) int table as a triangular MXU
    matmul — Pallas TPU has no cumsum lowering, and the counts here are
    < 2^24 so f32 accumulation is exact."""
    k = jax.lax.broadcasted_iota(jnp.int32, (NBINS, NBINS), 0)
    j = jax.lax.broadcasted_iota(jnp.int32, (NBINS, NBINS), 1)
    tri = (k <= j).astype(jnp.float32)
    return jax.lax.dot_general(
        x.astype(jnp.float32), tri,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


def _clip_hist_vmem(hist, clim):
    """Vectorized Zuiderveld clip+redistribute over a (N_TILES, NBINS) int32
    table (same math as ops/clahe._clip_histogram, batched over tiles)."""
    excess = jnp.where(hist > clim, hist - clim, 0)
    n_excess = jnp.sum(excess, axis=1)                      # (T,)
    hist = jnp.minimum(hist, clim)

    bin_incr = n_excess // NBINS
    upper = clim - bin_incr                                  # (T,)
    low = hist < upper[:, None]
    n_excess = n_excess - jnp.sum(low, axis=1) * bin_incr
    hist = jnp.where(low, hist + bin_incr[:, None], hist)
    mid = (hist >= upper[:, None]) & (hist < clim)
    n_excess = n_excess + jnp.sum(jnp.where(mid, hist - clim, 0), axis=1)
    hist = jnp.where(mid, clim, hist)

    bin_ids = jax.lax.broadcasted_iota(jnp.int32, (N_TILES, NBINS), 1)

    def cond(state):
        h, ne, added = state
        return jnp.logical_and(jnp.max(ne) > 0, added > 0)

    def body(state):
        h, ne, _ = state
        step = jnp.maximum(1, NBINS // jnp.maximum(ne, 1))   # (T,)
        eligible = (h < clim) & (bin_ids % step[:, None] == 0)
        rank = _row_cumsum(eligible.astype(jnp.int32))
        add = eligible & (rank <= ne[:, None])
        h = h + add.astype(jnp.int32)
        n_add = jnp.sum(add.astype(jnp.int32), axis=1)
        return h, ne - n_add, jnp.max(n_add)

    hist, _, _ = jax.lax.while_loop(cond, body, (hist, n_excess, jnp.int32(1)))
    return hist


def _kernel(clim_ref, area_ref, vbins_ref, vtiles_ref, vvalid_ref,
            pbins_ref, ptiles_ref, pw_ref, out_ref):
    clim = clim_ref[0, 0]
    area = area_ref[0, 0]

    # 1. histograms: batched one-hot contractions accumulated in f32.
    # blocks are (_VROWS, 128) pixels; the contraction batches over the
    # sublane dim and contracts the 128-lane pixel dim on the MXU.
    Rv = vbins_ref.shape[0]
    tile_ids3 = jax.lax.broadcasted_iota(jnp.int32, (_VROWS, 128, N_TILES), 2)
    bin_ids3 = jax.lax.broadcasted_iota(jnp.int32, (_VROWS, 128, NBINS), 2)

    def hist_step(b, acc):
        sl = pl.ds(b * _VROWS, _VROWS)
        t = vtiles_ref[sl, :]
        v = vvalid_ref[sl, :]
        bn = vbins_ref[sl, :]
        T = ((t[..., None] == tile_ids3) & (v[..., None] > 0)).astype(jnp.bfloat16)
        B = (bn[..., None] == bin_ids3).astype(jnp.bfloat16)
        part = jax.lax.dot_general(
            T, B, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )                                                    # (_VROWS, T, NBINS)
        return acc + jnp.sum(part, axis=0)

    hist = jax.lax.fori_loop(
        0, Rv // _VROWS, hist_step, jnp.zeros((N_TILES, NBINS), jnp.float32)
    ).astype(jnp.int32)

    # 2. clip + redistribute; 3. integer CDF maps
    hist = _clip_hist_vmem(hist, clim)
    cdf = _row_cumsum(hist)
    maps = jnp.minimum(
        (cdf * (NR_OF_GRAY - 1)) // jnp.maximum(area.astype(jnp.int32), 1),
        NR_OF_GRAY - 1,
    ).astype(jnp.float32)                                    # (T, NBINS)
    # bf16-exact split of the 14-bit map values (multiples of 64 + remainder
    # < 64): keeps the interp dots exact even where the MXU lowering rounds
    # f32 operands to a single bf16 pass (the ops/clahe.py mxu path measured
    # 2.1e-3 output deviation from exactly this, BENCH.md r2s9)
    maps_hi = jnp.floor(maps * (1.0 / 64.0)) * 64.0
    maps_lo = maps - maps_hi

    # 4. interpolation: per corner, rows = onehot_tile . maps, value = rows.B
    Rp = pbins_ref.shape[0]
    tile_ids3p = jax.lax.broadcasted_iota(jnp.int32, (_PROWS, 128, N_TILES), 2)
    bin_ids3p = jax.lax.broadcasted_iota(jnp.int32, (_PROWS, 128, NBINS), 2)

    def interp_step(b, _):
        sl = pl.ds(b * _PROWS, _PROWS)
        bn = pbins_ref[sl, :]
        Bm = (bn[..., None] == bin_ids3p).astype(jnp.float32)  # (_PROWS,128,NB)
        vals = jnp.zeros((_PROWS, 128), jnp.float32)
        for c in range(4):
            ct = ptiles_ref[c, sl, :]
            w = pw_ref[c, sl, :]
            T = (ct[..., None] == tile_ids3p).astype(jnp.float32)
            dnum = (((2,), (0,)), ((), ()))
            if prec.ablated("clahe"):                        # measurement only
                rows = jax.lax.dot_general(
                    T, maps, dimension_numbers=dnum,
                    preferred_element_type=jnp.float32,
                )
            else:
                rows = jax.lax.dot_general(
                    T, maps_hi, dimension_numbers=dnum,
                    preferred_element_type=jnp.float32,
                ) + jax.lax.dot_general(
                    T, maps_lo, dimension_numbers=dnum,
                    preferred_element_type=jnp.float32,
                )                                            # (_PROWS,128,NB)
            vals = vals + w * jnp.sum(rows * Bm, axis=-1)
        # exact-integer blend (see ops/clahe._clahe_one): the weights are
        # integer numerators, vals = S < 2^24 is f32-exact, and the output
        # is the rational floor S // (kh*kw)
        area_i = jnp.maximum(area.astype(jnp.int32), 1)
        out_ref[sl, :] = (vals.astype(jnp.int32) // area_i).astype(jnp.float32)
        return 0

    jax.lax.fori_loop(0, Rp // _PROWS, interp_step, 0)


@partial(jax.jit, static_argnames=())
def clahe_core_pallas(clim, area, vbins, vtiles, vvalid, pbins, ptiles, pw):
    """Batched (vmapped) fused CLAHE core.  Shapes per cell:
    vbins/vtiles/vvalid (Pv,), pbins (P,), ptiles/pw (P, 4), clim/area
    scalars.  Pv and P must be multiples of the internal block sizes
    (callers pad: 512 = _VROWS*128).  Returns (P,) floor-blended grays."""
    C, Pv = vbins.shape
    P = pbins.shape[1]
    assert Pv % (_VROWS * 128) == 0 and P % (_PROWS * 128) == 0

    def one(clim_s, area_s, vb, vt, vv, pb, pt, pww):
        interpret = jax.default_backend() == "cpu"
        return pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((P // 128, 128), jnp.float32),
            in_specs=[
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            interpret=interpret,
        )(
            clim_s.reshape(1, 1), area_s.reshape(1, 1),
            vb.reshape(-1, 128), vt.reshape(-1, 128),
            vv.reshape(-1, 128).astype(jnp.int32),
            pb.reshape(-1, 128),
            pt.T.reshape(4, -1, 128), pww.T.reshape(4, -1, 128),
        ).reshape(-1)

    return jax.vmap(one)(clim, area, vbins, vtiles, vvalid, pbins, ptiles, pw)
