"""Pallas TPU kernel: fused per-cell CLAHE core.

The XLA CLAHE (ops/clahe.py impl="mxu") runs the histogram and interpolation
as block-scanned one-hot matmuls whose intermediates round-trip HBM between
scan steps.  This kernel fuses the whole per-cell core in VMEM — grid =
(cells,), one program per cell:

  inputs (all precomputed by cheap XLA elementwise code, so no dynamic
  gathers happen inside the kernel):
    vbins  (Pv,)  int32  bin of each virtual-grid pixel (reflect-folded)
    vtiles (Pv,)  int32  tile id of each virtual-grid pixel
    vvalid (Pv,)  int32  virtual-grid validity
    pbins  (P,)   int32  bin of each output pixel
    ptiles (P,4)  int32  the 4 corner tile ids per output pixel
    pw     (P,4)  f32    the 4 bilinear corner weights
    clim   (1,1)  int32  clip limit (counts)   [SMEM]
    area   (1,1)  f32    kernel tile area kh*kw [SMEM]
  output:
    vals   (P,)   f32    blended mapped gray values (pre min-max rescale)

  stages in VMEM: one-hot matmul histograms (n_tiles=256 lanes — MXU-sized),
  Zuiderveld clip/redistribute (vectorized while loop over the (256, 256)
  hist table), integer CDF mapping, and 4-corner interpolation as
  (blk, 256) @ (256 tiles, 256 bins) matmuls with bin-one-hot row dots.

Semantics are identical to ops/clahe.py (same oracle tests drive both).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NS_CAP = 16
N_TILES = NS_CAP * NS_CAP
NBINS = 256
NR_OF_GRAY = 2 ** 14
_VBLK = 512   # virtual-grid pixels per histogram matmul
_PBLK = 512   # output pixels per interpolation matmul


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
        rank = jnp.cumsum(eligible.astype(jnp.int32), axis=1)
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

    # 1. histograms: block one-hot matmuls accumulated in f32
    Pv = vbins_ref.shape[0]
    tile_ids = jax.lax.broadcasted_iota(jnp.int32, (_VBLK, N_TILES), 1)
    bin_ids = jax.lax.broadcasted_iota(jnp.int32, (_VBLK, NBINS), 1)

    def hist_step(b, acc):
        sl = pl.ds(b * _VBLK, _VBLK)
        t = vtiles_ref[sl, 0]
        v = vvalid_ref[sl, 0]
        bn = vbins_ref[sl, 0]
        T = ((t[:, None] == tile_ids) & (v[:, None] > 0)).astype(jnp.bfloat16)
        B = (bn[:, None] == bin_ids).astype(jnp.bfloat16)
        return acc + jax.lax.dot_general(
            T, B, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    hist = jax.lax.fori_loop(
        0, Pv // _VBLK, hist_step, jnp.zeros((N_TILES, NBINS), jnp.float32)
    ).astype(jnp.int32)

    # 2. clip + redistribute; 3. integer CDF maps
    hist = _clip_hist_vmem(hist, clim)
    cdf = jnp.cumsum(hist, axis=1)
    maps = jnp.minimum(
        (cdf * (NR_OF_GRAY - 1)) // jnp.maximum(area.astype(jnp.int32), 1),
        NR_OF_GRAY - 1,
    ).astype(jnp.float32)                                    # (T, NBINS)

    # 4. interpolation: per corner, rows = onehot_tile @ maps, value = row.B
    P = pbins_ref.shape[0]
    tile_ids_p = jax.lax.broadcasted_iota(jnp.int32, (_PBLK, N_TILES), 1)
    bin_ids_p = jax.lax.broadcasted_iota(jnp.int32, (_PBLK, NBINS), 1)

    def interp_step(b, _):
        sl = pl.ds(b * _PBLK, _PBLK)
        bn = pbins_ref[sl, 0]
        Bm = (bn[:, None] == bin_ids_p).astype(jnp.float32)
        vals = jnp.zeros((_PBLK,), jnp.float32)
        for c in range(4):
            ct = ptiles_ref[sl, c]
            w = pw_ref[sl, c]
            # f32 throughout: maps hold 14-bit gray values, which bf16 would
            # round by ~0.4% (visible against the oracle)
            T = (ct[:, None] == tile_ids_p).astype(jnp.float32)
            rows = jax.lax.dot_general(
                T, maps,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            vals = vals + w * jnp.sum(rows * Bm, axis=1)
        out_ref[sl, 0] = jnp.floor(vals)
        return 0

    jax.lax.fori_loop(0, P // _PBLK, interp_step, 0)


@partial(jax.jit, static_argnames=())
def clahe_core_pallas(clim, area, vbins, vtiles, vvalid, pbins, ptiles, pw):
    """Batched (vmapped) fused CLAHE core.  Shapes per cell:
    vbins/vtiles/vvalid (Pv,), pbins (P,), ptiles/pw (P, 4), clim/area
    scalars.  Pv and P must be multiples of the internal block sizes
    (callers pad).  Returns (P,) floor-blended gray values."""
    C, Pv = vbins.shape
    P = pbins.shape[1]

    def one(clim_s, area_s, vb, vt, vv, pb, pt, pww):
        interpret = jax.default_backend() == "cpu"
        return pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((P, 1), jnp.float32),
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
            vb[:, None], vt[:, None], vv[:, None].astype(jnp.int32),
            pb[:, None], pt, pww,
        )[:, 0]

    return jax.vmap(one)(clim, area, vbins, vtiles, vvalid, pbins, ptiles, pw)
