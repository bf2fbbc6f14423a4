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
- per-tile histograms are built with one segment-sum over a fixed "virtual"
  pixel grid (capacity + max kernel) whose indices reflect-fold into the
  actual crop, reproducing skimage's reflect padding without materializing it;
- Zuiderveld clip/redistribute runs as a vmapped `lax.while_loop` whose
  residual-spread passes are the vectorized equivalent of the oracle's
  step-walk;
- the final mapping interpolation is 4 gathers per pixel from the
  (16*16, nbins) mapping table with edge-clamped tile indices.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

NR_OF_GRAY = 2 ** 14
NS_CAP = 16  # >= ceil(side / max(1, side//8)) for every side >= 1


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

    def cond(state):
        h, ne, added = state
        return (ne > 0) & (added > 0)

    def body(state):
        h, ne, _ = state
        step = jnp.maximum(1, nbins // jnp.maximum(ne, 1))
        eligible = (h < clim) & (bin_ids % step == 0)
        rank = jnp.cumsum(eligible.astype(jnp.int32))
        add = eligible & (rank <= ne)
        h = h + add.astype(jnp.int32)
        n_added = jnp.sum(add.astype(jnp.int32))
        return h, ne - n_added, n_added

    hist, _, _ = jax.lax.while_loop(cond, body, (hist, n_excess, jnp.int32(1)))
    return hist


def _clahe_one(
    crop: jax.Array,
    h: jax.Array,
    w: jax.Array,
    clip_limit: float,
    nbins: int,
    grid: int,
    vcap: int,
) -> jax.Array:
    cap = crop.shape[0]
    ys = jnp.arange(cap)
    valid = (ys[:, None] < h) & (ys[None, :] < w)

    # 1. 14-bit min-max quantization over the valid region.
    big = jnp.float32(jnp.finfo(jnp.float32).max)
    v = crop.astype(jnp.float32)
    lo = jnp.min(jnp.where(valid, v, big))
    hi = jnp.max(jnp.where(valid, v, -big))
    scale = jnp.where(hi > lo, (NR_OF_GRAY - 1) / (hi - lo), 0.0)
    img14 = jnp.round((v - lo) * scale).astype(jnp.int32)
    bin_size = 1 + NR_OF_GRAY // nbins
    binned = jnp.clip(img14 // bin_size, 0, nbins - 1)

    kh = jnp.maximum(1, h // grid)
    kw = jnp.maximum(1, w // grid)
    ns_h = (h + kh - 1) // kh
    ns_w = (w + kw - 1) // kw

    # 2. Per-tile histograms over the virtual (reflect-folded) grid.
    yv = jnp.arange(vcap)
    ty = yv[:, None] // kh
    tx = yv[None, :] // kw
    vvalid = (yv[:, None] < ns_h * kh) & (yv[None, :] < ns_w * kw)
    src = binned[_reflect(yv, h)[:, None], _reflect(yv, w)[None, :]]
    n_seg = NS_CAP * NS_CAP * nbins
    seg = (ty * NS_CAP + tx) * nbins + src
    seg = jnp.where(vvalid, seg, n_seg)
    hists = jax.ops.segment_sum(
        vvalid.reshape(-1).astype(jnp.int32), seg.reshape(-1), num_segments=n_seg + 1
    )[:-1].reshape(NS_CAP * NS_CAP, nbins)

    # 3. Clip + redistribute; 4. integer CDF mapping to gray levels.
    clim = jnp.maximum(1, (clip_limit * (kh * kw).astype(jnp.float32)).astype(jnp.int32))
    hists = jax.vmap(lambda hh: _clip_histogram(hh, clim, nbins))(hists)
    cdf = jnp.cumsum(hists, axis=-1)
    maps = jnp.minimum(cdf * (NR_OF_GRAY - 1) // (kh * kw), NR_OF_GRAY - 1)
    maps_flat = maps.reshape(-1)  # (NS_CAP*NS_CAP*nbins,)

    # 5. Bilinear blend of the 4 neighboring tile mappings per pixel.
    yp = ys[:, None] + kh // 2
    xp = ys[None, :] + kw // 2
    pty = yp // kh
    ptx = xp // kw
    cy = (yp % kh).astype(jnp.float32) / kh.astype(jnp.float32)
    cx = (xp % kw).astype(jnp.float32) / kw.astype(jnp.float32)

    out = jnp.zeros((cap, cap), jnp.float32)
    for ey in (0, 1):
        my = jnp.clip(pty - 1 + ey, 0, ns_h - 1)
        wy = cy if ey else 1.0 - cy
        for ex in (0, 1):
            mx = jnp.clip(ptx - 1 + ex, 0, ns_w - 1)
            wx = cx if ex else 1.0 - cx
            gathered = maps_flat[(my * NS_CAP + mx) * nbins + binned]
            out = out + wy * wx * gathered.astype(jnp.float32)
    out = jnp.floor(out)

    # 6. Min-max rescale to [0, 1] over the valid region.
    lo2 = jnp.min(jnp.where(valid, out, big))
    hi2 = jnp.max(jnp.where(valid, out, -big))
    scale2 = jnp.where(hi2 > lo2, 1.0 / (hi2 - lo2), 0.0)
    return jnp.where(valid, (out - lo2) * scale2, 0.0)


@partial(jax.jit, static_argnames=("clip_limit", "nbins", "grid"))
def clahe_cells(
    crops: jax.Array,
    heights: jax.Array,
    widths: jax.Array,
    clip_limit: float = 0.02,
    nbins: int = 256,
    grid: int = 8,
) -> jax.Array:
    """Batched CLAHE over capacity-padded crops.

    Args:
      crops:   (C, cap, cap) raw-intensity crops (any monotone scale — the
               algorithm min-max quantizes per crop, so uint16 TIFF counts and
               floats behave identically, matching img_as_uint + full-range
               rescale in the reference stack).
      heights/widths: (C,) int32 actual sizes.
    Returns (C, cap, cap) float32 in [0, 1]; padding region zeroed.
    """
    cap = crops.shape[-1]
    vcap = cap + max(1, cap // grid)  # covers ceil(s/k)*k <= s + k - 1
    fn = lambda c, h, w: _clahe_one(c, h, w, clip_limit, nbins, grid, vcap)
    return jax.vmap(fn)(crops, heights, widths)
