"""Region properties of an instance label map via segment reductions.

TPU-native replacement for the `skimage.measure.regionprops` calls in the QC
loop (CAE_improved_modeltrain.py:59, improved_detection.py:67).  The
reference iterates regions in Python (SURVEY.md hot loop #2); here every
property of every region is computed at once with `segment_sum/min/max` over
the flattened label map — one fused pass per frame, static output capacity.

Properties produced (exactly the ones the reference QC gates + stats recorder
consume):
  area, bbox (min_r, min_c, max_r, max_c — max exclusive, skimage
  convention), centroid, eccentricity (central-moment inertia eigenvalues,
  skimage formula).

Intensity mean/std over the bbox *rectangle* (reference semantics,
CAE_improved_modeltrain.py:80-84: stats of the unmasked crop) are computed
later from the gathered crops (ops/extract.py) where float32 is exact;
solidity (report-only) is host-side (ops/oracle/regionprops_np.convex_area).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.utils import prec


class RegionProps(NamedTuple):
    """Arrays indexed by label-1, length = capacity; `valid` marks labels that
    exist (area > 0)."""

    area: jax.Array          # (K,) int32
    min_r: jax.Array         # (K,) int32
    min_c: jax.Array
    max_r: jax.Array         # exclusive
    max_c: jax.Array
    centroid_r: jax.Array    # (K,) float32
    centroid_c: jax.Array
    eccentricity: jax.Array  # (K,) float32
    valid: jax.Array         # (K,) bool


def _segment_sums_mxu(seg: jax.Array, data: jax.Array, n_seg: int, blk: int = 2048) -> jax.Array:
    """segment_sum(data, seg) as block-scanned one-hot matmuls on the MXU.

    seg: (P,) int32 in [0, n_seg); data: (P, F) float32.  Exact for counts and
    coordinate sums: the one-hots are 0/1 bf16 and accumulation is f32 via
    preferred_element_type.  Beats TPU scatter when n_seg is modest
    (histogram-style workloads); the scatter path stays for CPU."""
    P, F = data.shape
    n_pad = -(-n_seg // 128) * 128  # lane-align the segment axis
    n_blocks = (P + blk - 1) // blk
    pad = n_blocks * blk - P
    seg_b = jnp.pad(seg, (0, pad), constant_values=n_pad - 1).reshape(n_blocks, blk)
    data_b = jnp.pad(data, ((0, pad), (0, 0))).reshape(n_blocks, blk, F)
    ids = jnp.arange(n_pad)

    def step(acc, args):
        s, d = args
        # HIGHEST: the TPU default contraction is a SINGLE bf16 pass that
        # rounds BOTH operands — the one-hot stays exact but the data
        # columns (coords to 4096, squared coords to 1.6e7) would lose up
        # to 2^-9 relative per term.  HIGHEST keeps the sums f32-exact;
        # F is tiny so the extra passes are noise.
        onehot = (s[:, None] == ids[None, :]).astype(jnp.float32)
        acc = acc + jax.lax.dot_general(
            onehot, d.astype(jnp.float32),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec.highest("regionprops"),
        )
        return acc, None

    out, _ = jax.lax.scan(step, jnp.zeros((n_pad, F), jnp.float32), (seg_b, data_b))
    return out[:n_seg]


def _bbox_mxu(seg: jax.Array, rr: jax.Array, cc: jax.Array, n_seg: int,
              h: int, w: int, blk: int = 2048):
    """Per-segment bbox via presence matrices: presence[s, r] > 0 iff segment
    s has a pixel in row r (one matmul per axis), then min/max through masked
    iota reductions — no scatter."""
    P = seg.shape[0]
    n_pad = -(-n_seg // 128) * 128
    n_blocks = (P + blk - 1) // blk
    pad = n_blocks * blk - P
    seg_b = jnp.pad(seg, (0, pad), constant_values=n_pad - 1).reshape(n_blocks, blk)
    rr_b = jnp.pad(rr, (0, pad)).reshape(n_blocks, blk)
    cc_b = jnp.pad(cc, (0, pad)).reshape(n_blocks, blk)
    ids = jnp.arange(n_pad)
    hp = -(-h // 128) * 128
    wp = -(-w // 128) * 128

    def step(acc, args):
        s, r, c = args
        onehot_s = (s[:, None] == ids[None, :]).astype(jnp.bfloat16)
        onehot_r = (r[:, None] == jnp.arange(hp)[None, :]).astype(jnp.bfloat16)
        onehot_c = (c[:, None] == jnp.arange(wp)[None, :]).astype(jnp.bfloat16)
        pr = jax.lax.dot_general(onehot_s, onehot_r, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        pc = jax.lax.dot_general(onehot_s, onehot_c, (((0,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return (acc[0] + pr, acc[1] + pc), None

    (pres_r, pres_c), _ = jax.lax.scan(
        step,
        (jnp.zeros((n_pad, hp), jnp.float32), jnp.zeros((n_pad, wp), jnp.float32)),
        (seg_b, rr_b, cc_b),
    )
    big = jnp.int32(1 << 30)
    ridx = jnp.arange(hp)[None, :]
    cidx = jnp.arange(wp)[None, :]
    min_r = jnp.min(jnp.where(pres_r[:n_seg] > 0, ridx, big), axis=1)
    max_r = jnp.max(jnp.where(pres_r[:n_seg] > 0, ridx, -1), axis=1)
    min_c = jnp.min(jnp.where(pres_c[:n_seg] > 0, cidx, big), axis=1)
    max_c = jnp.max(jnp.where(pres_c[:n_seg] > 0, cidx, -1), axis=1)
    return min_r, min_c, max_r, max_c


@partial(jax.jit, static_argnames=("capacity", "fg_fraction", "impl"))
def regionprops(labels: jax.Array, capacity: int, fg_fraction: float = 0.25,
                impl: str = "auto") -> RegionProps:
    """Compute properties for labels 1..capacity of an (H, W) int32 map.

    Foreground pixels are compacted to a fixed capacity (`fg_fraction` of the
    frame) before the segment reductions — background dominates real frames,
    and scatter cost on TPU scales with element count, so this cuts the
    reduction passes ~1/fg_fraction-fold.  Frames with more foreground than
    the capacity would produce truncated statistics; `valid` stays correct
    because such frames are pathological (cells cover >fg_fraction of the
    plate) — raise fg_fraction for dense plates.
    """
    h, w = labels.shape
    flat = labels.reshape(-1)
    fg_cap = max(int(h * w * fg_fraction), 1024)
    # cumsum + rank-scatter compaction: equivalent to
    # jnp.nonzero(size=fg_cap, fill_value=h*w) but 1.5x faster on TPU
    # (nonzero's lowering measured 106.6 vs 72.6 ms on 8x1024^2; BENCH.md)
    fg_mask = flat > 0
    ranks = jnp.cumsum(fg_mask.astype(jnp.int32))
    pos = jnp.minimum(jnp.where(fg_mask, ranks - 1, fg_cap), fg_cap)
    fgidx = (
        jnp.full((fg_cap + 1,), h * w, jnp.int32)
        .at[pos].set(jnp.arange(h * w, dtype=jnp.int32), mode="drop")[:fg_cap]
    )
    in_fg = fgidx < h * w
    fgi = jnp.minimum(fgidx, h * w - 1)
    lab_fg = jnp.where(in_fg, flat[fgi], 0)

    seg = lab_fg - 1  # -1 -> background/padding, routed to dump segment
    seg = jnp.where(seg < 0, capacity, seg)
    seg = jnp.minimum(seg, capacity)  # labels beyond capacity also dumped
    n_seg = capacity + 1

    rr = fgi // w
    cc = fgi % w

    if impl == "auto":
        # measured: with ~4k segments the one-hot matmuls lose to scatter on
        # TPU too — XLA materializes the (block, n_seg) one-hots in HBM
        # (34 MB/block), unlike the 128-wide CLAHE histograms that stay
        # fused.  "mxu" remains available for narrow-capacity configs and as
        # the blueprint for a VMEM-resident Pallas kernel.
        impl = "scatter"

    # Fused reductions, TWO scatter passes total (scatter throughput is the
    # regionprops bottleneck on TPU — see BENCH.md):
    #   pass 1: bbox via segment_max;
    #   pass 2: one 6-wide segment_sum of bbox-anchored deltas
    #           [1, dr, dc, dr^2, dc^2, dr*dc] with dr = r - min_r[seg].
    # Anchoring at the exact (int) bbox min keeps |d| <= crop size, so the
    # delta products are integers < 2^24 per element and the sums stay
    # f32-accurate; centroid = min + sum(d)/A and the central moments follow
    # from the parallel-axis identity mu = E[d^2] - E[d]^2 without the
    # full-frame-coordinate cancellation that motivated the old centroid
    # second pass (which cost an extra scatter AND a centroid gather).
    rf = rr.astype(jnp.float32)
    cf = cc.astype(jnp.float32)

    if impl == "mxu":
        mnr_raw, mnc_raw, mxr, mxc = _bbox_mxu(seg, rr, cc, capacity, h, w)
        mxr = mxr
        mxc = mxc
    else:
        mx = jax.ops.segment_max(
            jnp.stack([rr, cc, -rr, -cc], axis=1), seg, num_segments=n_seg
        )[:capacity]
        mxr, mxc = mx[:, 0], mx[:, 1]
        mnr_raw, mnc_raw = -mx[:, 2], -mx[:, 3]

    anchor_r = jnp.concatenate([jnp.clip(mnr_raw, 0, h - 1), jnp.zeros((1,), jnp.int32)])
    anchor_c = jnp.concatenate([jnp.clip(mnc_raw, 0, w - 1), jnp.zeros((1,), jnp.int32)])
    dr = rf - anchor_r[seg].astype(jnp.float32)
    dc = cf - anchor_c[seg].astype(jnp.float32)
    data = jnp.stack([jnp.ones_like(dr), dr, dc, dr * dr, dc * dc, dr * dc], axis=1)
    if impl == "mxu":
        sums = _segment_sums_mxu(seg, data, n_seg)[:capacity]
    else:
        sums = jax.ops.segment_sum(data, seg, num_segments=n_seg)[:capacity]

    area = sums[:, 0].astype(jnp.int32)
    valid = area > 0
    areaf = jnp.maximum(sums[:, 0], 1.0)

    min_r = jnp.where(valid, mnr_raw, 0)
    min_c = jnp.where(valid, mnc_raw, 0)
    max_r = jnp.where(valid, mxr + 1, 0)
    max_c = jnp.where(valid, mxc + 1, 0)

    er = sums[:, 1] / areaf
    ec = sums[:, 2] / areaf
    cy = jnp.clip(mnr_raw, 0, h - 1).astype(jnp.float32) + er
    cx = jnp.clip(mnc_raw, 0, w - 1).astype(jnp.float32) + ec
    mu20 = sums[:, 3] / areaf - er * er
    mu02 = sums[:, 4] / areaf - ec * ec
    mu11 = sums[:, 5] / areaf - er * ec

    t = (mu20 + mu02) / 2.0
    d = jnp.sqrt(((mu20 - mu02) / 2.0) ** 2 + mu11 ** 2)
    l1, l2 = t + d, t - d
    ecc = jnp.where(l1 > 0, jnp.sqrt(jnp.clip(1.0 - l2 / jnp.maximum(l1, 1e-20), 0.0, 1.0)), 0.0)

    return RegionProps(
        area=area,
        min_r=min_r,
        min_c=min_c,
        max_r=max_r,
        max_c=max_c,
        centroid_r=jnp.where(valid, cy, 0.0),
        centroid_c=jnp.where(valid, cx, 0.0),
        eccentricity=jnp.where(valid, ecc, 0.0),
        valid=valid,
    )


@partial(jax.jit, static_argnames=())
def qc_mask(
    props: RegionProps,
    height: jax.Array,
    width: jax.Array,
    border_margin: int = 10,
    min_area: int = 200,
    max_area: int = 8000,
    max_eccentricity: float = 0.95,
) -> jax.Array:
    """Geometric QC gates (CAE_improved_modeltrain.py:68-77): border margin
    against the label-map shape, area window, eccentricity ceiling.  Intensity
    gates are applied downstream on gathered crops."""
    border_ok = (
        (props.min_r >= border_margin)
        & (props.min_c >= border_margin)
        & (props.max_r <= height - border_margin)
        & (props.max_c <= width - border_margin)
    )
    area_ok = (props.area >= min_area) & (props.area <= max_area)
    ecc_ok = props.eccentricity <= max_eccentricity
    return props.valid & border_ok & area_ok & ecc_ok
