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


@partial(jax.jit, static_argnames=("capacity", "fg_fraction"))
def regionprops(labels: jax.Array, capacity: int, fg_fraction: float = 0.25) -> RegionProps:
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
    fgidx = jnp.nonzero(flat > 0, size=fg_cap, fill_value=h * w)[0]
    in_fg = fgidx < h * w
    fgi = jnp.minimum(fgidx, h * w - 1)
    lab_fg = jnp.where(in_fg, flat[fgi], 0)

    seg = lab_fg - 1  # -1 -> background/padding, routed to dump segment
    seg = jnp.where(seg < 0, capacity, seg)
    seg = jnp.minimum(seg, capacity)  # labels beyond capacity also dumped
    n_seg = capacity + 1

    rr = fgi // w
    cc = fgi % w

    # Fused reductions: each segment op over the full frame is a sort/scatter
    # pass on TPU, so the nine original reductions are packed into one
    # stacked sum, one stacked max (min = max of negation), and one stacked
    # sum for the central moments — 3 passes total.
    rf = rr.astype(jnp.float32)
    cf = cc.astype(jnp.float32)
    sum1 = jax.ops.segment_sum(
        jnp.stack([jnp.ones_like(rf), rf, cf], axis=1), seg, num_segments=n_seg
    )[:capacity]
    area = sum1[:, 0].astype(jnp.int32)
    valid = area > 0
    areaf = jnp.maximum(sum1[:, 0], 1.0)

    mx = jax.ops.segment_max(
        jnp.stack([rr, cc, -rr, -cc], axis=1), seg, num_segments=n_seg
    )[:capacity]
    max_r = jnp.where(valid, mx[:, 0] + 1, 0)
    max_c = jnp.where(valid, mx[:, 1] + 1, 0)
    min_r = jnp.where(valid, -mx[:, 2], 0)
    min_c = jnp.where(valid, -mx[:, 3], 0)

    cy, cx = sum1[:, 1] / areaf, sum1[:, 2] / areaf
    # central second moments in a second pass: gathering each pixel's segment
    # centroid keeps the deltas small, avoiding the float32 cancellation of
    # the parallel-axis form (sum r^2 overflows the 24-bit mantissa on large
    # frames)
    cy_full = jnp.concatenate([cy, jnp.zeros((1,), cy.dtype)])
    cx_full = jnp.concatenate([cx, jnp.zeros((1,), cx.dtype)])
    dr = rf - cy_full[seg]
    dc = cf - cx_full[seg]
    sum2 = jax.ops.segment_sum(
        jnp.stack([dr * dr, dc * dc, dr * dc], axis=1), seg, num_segments=n_seg
    )[:capacity]
    mu20 = sum2[:, 0] / areaf
    mu02 = sum2[:, 1] / areaf
    mu11 = sum2[:, 2] / areaf

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
