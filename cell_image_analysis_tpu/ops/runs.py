"""Run-length (row-run) connected components + regionprops.

The production stage-A bottlenecks on TPU are pixel-level: iterative CC over
the full frame (~165 ms / 8x1024^2, geodesic-bound — BENCH.md) and the
foreground-pixel compaction + scatter segment reductions in regionprops
(~120 ms).  Row runs shrink the working domain ~32x:

- Per-pixel run metadata (start flags, ranks) comes from axis-wise cumsums —
  no scatter, no compaction.
- A fixed-capacity run table `[H, RCAP]` (start/end columns per row) is the
  CC domain: two runs in adjacent rows are pixel-connected iff their column
  intervals overlap (touch, for 8-connectivity), so CC is neighbor-min "hook"
  iterations over `[H, RCAP, RCAP]` overlap tests — small fused elementwise
  passes (~1 MB of parent state vs ~34 MB per pixel sweep).  A per-round
  pointer-double (`p = p[p]`) is available via `jump=True` (cuts hook rounds
  64-88 -> 20) but measured SLOWER end-to-end on this TPU — the table
  gathers cost more than the extra hook rounds (BENCH.md: 46.6 vs 78.8 ms,
  re-measured 33.0 vs 46.9) — so production call sites keep jump=False.
- Region moments are closed-form per run (arithmetic-series sums), so the
  segment reductions run over H*RCAP run slots instead of fg-compacted
  pixels, and the instance label map is never materialized.

Replaces `scipy.ndimage.label` + `skimage.measure.regionprops` in the QC loop
(reference call sites: CAE_improved_modeltrain.py:54-59,
improved_detection.py:63-67) for the threshold segmentation backend.

Exactness: component numbering is raster order of each component's
topmost-leftmost pixel — identical to scipy.ndimage.label — and area/bbox are
bit-exact vs the pixel path; centroid/eccentricity agree to float32
summation-order tolerance (~1e-5).  Rows with more than RCAP runs cannot be
represented; every entry point returns an `overflow` flag (computed on
device, fetched with the batch's stats) so callers can re-run the exact
pixel path — impossible by construction for the production threshold backend
at RCAP >= W/4 after binary opening (runs >= 3 px + gaps >= 1 px), and never
observed below RCAP=64 on realistic plates.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.ops.regionprops import RegionProps

_INF = jnp.int32(1 << 30)


class RunTable(NamedTuple):
    """Row runs of a boolean mask, padded to a static per-row capacity.

    Slot (r, j) is the j-th foreground run of row r (ascending column).
    Invalid slots have start=W (sentinel past any column) and end=0, which
    makes 4-connectivity overlap tests against them false; 8-connectivity
    (touch, d=1) additionally masks with slot validity in cc_runs — the
    sentinel alone passes the touch test against a full-width run."""

    start: jax.Array     # (H, RCAP) int32 first column; W where unused
    end: jax.Array       # (H, RCAP) int32 one-past-last column; 0 where unused
    overflow: jax.Array  # () bool — some row had more than RCAP runs


def _start_end_flags(mask: jax.Array):
    left = jnp.pad(mask, ((0, 0), (1, 0)))[:, :-1]
    right = jnp.pad(mask, ((0, 0), (0, 1)))[:, 1:]
    return mask & ~left, mask & ~right


@partial(jax.jit, static_argnames=("rcap", "impl"))
def run_table(mask: jax.Array, rcap: int = 64, impl: str = "topk") -> RunTable:
    """Extract the padded row-run table of an (H, W) boolean mask.

    impl="scatter": per-pixel rank (cumsum of start flags along the row)
    scatters each run's start/end column to its (row, rank) slot; non-start
    pixels and overflow ranks route to a scrap column.  One pass, cost ~ the
    frame's scatter throughput.

    impl="topk": `lax.top_k` over descending keys (W - column at start
    flags) yields start columns in ascending order without a scatter —
    kept as a fallback for backends where scatter is the bottleneck."""
    h, w = mask.shape
    is_start, is_end = _start_end_flags(mask)
    nruns = jnp.sum(is_start.astype(jnp.int32), axis=1)
    overflow = jnp.any(nruns > rcap)

    if impl == "topk":
        c = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
        vs, _ = jax.lax.top_k(jnp.where(is_start, w - c, 0), rcap)
        ve, _ = jax.lax.top_k(jnp.where(is_end, w - c, 0), rcap)
        start = jnp.where(vs > 0, w - vs, w)
        end = jnp.where(ve > 0, w - ve + 1, 0)
        return RunTable(start, end, overflow)

    rank = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    c = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    r = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)
    js = jnp.where(is_start, jnp.minimum(rank, rcap), rcap)
    je = jnp.where(is_end, jnp.minimum(rank, rcap), rcap)
    start = (
        jnp.full((h, rcap + 1), w, jnp.int32)
        .at[r.ravel(), js.ravel()].set(c.ravel())[:, :rcap]
    )
    end = (
        jnp.zeros((h, rcap + 1), jnp.int32)
        .at[r.ravel(), je.ravel()].set(c.ravel() + 1)[:, :rcap]
    )
    return RunTable(start, end, overflow)


def _shift_rows(x: jax.Array, off: int, fill) -> jax.Array:
    return jnp.pad(x, ((1, 1), (0, 0)), constant_values=fill)[1 + off : 1 + off + x.shape[0]]


@partial(jax.jit, static_argnames=("connectivity", "check_every", "jump"))
def cc_runs(
    table: RunTable, connectivity: int = 1, check_every: int = 4, jump: bool = False
) -> jax.Array:
    """Component-min run ids (r*RCAP + j of each component's raster-first
    run) via neighbor-min hook iterations, INF on invalid slots.

    One hook updates each run with the min parent over overlapping runs in
    the two adjacent rows — labels travel a row per hook but an arbitrary
    distance horizontally (a wide run hooks every run it touches at once).
    With `jump`, a pointer-double (`p = min(p, p[p])`, a gather over the
    H*RCAP table — tiny next to full-frame gathers) runs once per
    `check_every` hooks, making convergence ~logarithmic in component
    height (measured 64-88 -> 20 rounds on 1024^2 plates)."""
    start, end = table.start, table.end
    h, rcap = start.shape
    valid = end > 0
    own = (
        jnp.arange(h, dtype=jnp.int32)[:, None] * rcap
        + jnp.arange(rcap, dtype=jnp.int32)[None, :]
    )
    p0 = jnp.where(valid, own, _INF)
    d = jnp.int32(1 if connectivity == 2 else 0)
    s_up = _shift_rows(start, -1, 1 << 20)
    e_up = _shift_rows(end, -1, 0)
    s_dn = _shift_rows(start, 1, 1 << 20)
    e_dn = _shift_rows(end, 1, 0)
    # interval overlap (touch for 8-conn).  The invalid-slot sentinel
    # (start=W, end=0) fails both tests at d=0, but at d=1 it passes them
    # against a full-width neighbor run (W < W+1 and 0 < 0+1), which would
    # let an invalid slot acquire a parent and relay labels across an
    # all-background row — so overlap is additionally masked with the
    # validity of both endpoints.
    v_up = _shift_rows(valid, -1, False)
    v_dn = _shift_rows(valid, 1, False)
    ov_up = (start[:, :, None] < e_up[:, None, :] + d) & (s_up[:, None, :] < end[:, :, None] + d)
    ov_dn = (start[:, :, None] < e_dn[:, None, :] + d) & (s_dn[:, None, :] < end[:, :, None] + d)
    ov_up &= valid[:, :, None] & v_up[:, None, :]
    ov_dn &= valid[:, :, None] & v_dn[:, None, :]

    def cond(st):
        return st[1]

    def body(st):
        p, _ = st
        new = p
        for _ in range(check_every):
            p_up = _shift_rows(new, -1, _INF)
            p_dn = _shift_rows(new, 1, _INF)
            m_up = jnp.min(jnp.where(ov_up, p_up[:, None, :], _INF), axis=2)
            m_dn = jnp.min(jnp.where(ov_dn, p_dn[:, None, :], _INF), axis=2)
            new = jnp.minimum(new, jnp.minimum(m_up, m_dn))
        if jump:
            flat = new.reshape(-1)
            jumped = flat[jnp.minimum(flat, h * rcap - 1)].reshape(h, rcap)
            new = jnp.where(valid, jnp.minimum(new, jumped), _INF)
        return new, jnp.any(new != p)

    p, _ = jax.lax.while_loop(cond, body, (p0, jnp.any(p0 >= 0)))
    return p


def _component_numbers(parent: jax.Array, valid: jax.Array):
    """1..K component numbers per run slot (0 invalid), in raster order of
    each component's first run — scipy.ndimage.label numbering."""
    h, rcap = parent.shape
    own = (
        jnp.arange(h, dtype=jnp.int32)[:, None] * rcap
        + jnp.arange(rcap, dtype=jnp.int32)[None, :]
    )
    flatp = parent.reshape(-1)
    is_root = valid.reshape(-1) & (flatp == own.reshape(-1))
    cnum = jnp.cumsum(is_root.astype(jnp.int32))
    comp = jnp.where(valid.reshape(-1), cnum[jnp.minimum(flatp, h * rcap - 1)], 0)
    return comp.reshape(h, rcap), cnum[-1]


def _run_moments(seg, r, sf, ef, vf, capacity: int, h: int, w: int) -> RegionProps:
    """Closed-form per-run moments -> segment reductions over run slots.
    `seg`: 0-based region index per run slot (capacity = dump)."""
    n_seg = capacity + 1
    ln = jnp.where(vf, ef - sf, 0)

    # pass 1: bbox via one 4-wide segment_max (invalid slots routed to dump)
    mx = jax.ops.segment_max(
        jnp.stack([r, ef - 1, -r, -jnp.where(vf, sf, _INF)], axis=1),
        seg, num_segments=n_seg,
    )[:capacity]
    mxr, mxc = mx[:, 0], mx[:, 1]
    mnr_raw, mnc_raw = -mx[:, 2], -mx[:, 3]

    # pass 2: one 6-wide segment_sum of bbox-anchored closed-form run moments
    # (same parallel-axis construction as ops/regionprops.py — anchoring at
    # the exact bbox min keeps the per-run terms small for QC-sized cells)
    anchor_r = jnp.concatenate([jnp.clip(mnr_raw, 0, h - 1), jnp.zeros((1,), jnp.int32)])
    anchor_c = jnp.concatenate([jnp.clip(mnc_raw, 0, w - 1), jnp.zeros((1,), jnp.int32)])
    lnf = ln.astype(jnp.float32)
    dr = (r - anchor_r[seg]).astype(jnp.float32)
    c0 = (sf - anchor_c[seg]).astype(jnp.float32)
    # sums over the run's columns c0 .. c0+ln-1 (arithmetic series)
    tri = lnf * (lnf - 1.0) / 2.0
    sum_dc = lnf * c0 + tri
    sum_dc2 = lnf * c0 * c0 + 2.0 * c0 * tri + (lnf - 1.0) * lnf * (2.0 * lnf - 1.0) / 6.0
    data = jnp.stack(
        [lnf, dr * lnf, sum_dc, dr * dr * lnf, sum_dc2, dr * sum_dc], axis=1
    )
    sums = jax.ops.segment_sum(data, seg, num_segments=n_seg)[:capacity]

    area = sums[:, 0].astype(jnp.int32)
    valid_lab = area > 0
    areaf = jnp.maximum(sums[:, 0], 1.0)
    er = sums[:, 1] / areaf
    ec = sums[:, 2] / areaf
    cy = jnp.clip(mnr_raw, 0, h - 1).astype(jnp.float32) + er
    cx = jnp.clip(mnc_raw, 0, w - 1).astype(jnp.float32) + ec
    mu20 = sums[:, 3] / areaf - er * er
    mu02 = sums[:, 4] / areaf - ec * ec
    mu11 = sums[:, 5] / areaf - er * ec
    t = (mu20 + mu02) / 2.0
    dd = jnp.sqrt(((mu20 - mu02) / 2.0) ** 2 + mu11**2)
    l1, l2 = t + dd, t - dd
    ecc = jnp.where(
        l1 > 0, jnp.sqrt(jnp.clip(1.0 - l2 / jnp.maximum(l1, 1e-20), 0.0, 1.0)), 0.0
    )

    return RegionProps(
        area=area,
        min_r=jnp.where(valid_lab, mnr_raw, 0),
        min_c=jnp.where(valid_lab, mnc_raw, 0),
        max_r=jnp.where(valid_lab, mxr + 1, 0),
        max_c=jnp.where(valid_lab, mxc + 1, 0),
        centroid_r=jnp.where(valid_lab, cy, 0.0),
        centroid_c=jnp.where(valid_lab, cx, 0.0),
        eccentricity=jnp.where(valid_lab, ecc, 0.0),
        valid=valid_lab,
    )


@partial(jax.jit, static_argnames=("capacity", "rcap", "connectivity", "impl"))
def regionprops_from_mask(
    mask: jax.Array,
    capacity: int,
    rcap: int = 64,
    connectivity: int = 1,
    impl: str = "topk",
) -> tuple[RegionProps, jax.Array]:
    """RegionProps of a boolean mask's connected components, without ever
    materializing the label map: runs -> hook CC -> closed-form per-run
    moments -> segment reductions over H*RCAP run slots.

    Output contract matches `regionprops(label_components(mask)[0], capacity)`
    (ops/regionprops.py): arrays indexed by label-1 in scipy numbering;
    area/bbox bit-exact, centroid/eccentricity to f32 tolerance.  Also
    returns the run-capacity `overflow` flag — results are only trustworthy
    when it is False (callers fall back to the pixel path)."""
    h, w = mask.shape
    table = run_table(mask, rcap=rcap, impl=impl)
    parent = cc_runs(table, connectivity=connectivity)
    valid = table.end > 0
    comp, _ = _component_numbers(parent, valid)

    seg = jnp.where(comp.reshape(-1) > 0, comp.reshape(-1) - 1, capacity)
    seg = jnp.minimum(seg, capacity)
    r = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.int32)[:, None], (h, rcap)
    ).reshape(-1)
    props = _run_moments(seg, r, table.start.reshape(-1), table.end.reshape(-1),
                         valid.reshape(-1), capacity, h, w)
    return props, table.overflow


@partial(jax.jit, static_argnames=("capacity", "rcap"))
def regionprops_from_labels(
    labels: jax.Array, capacity: int, rcap: int = 64
) -> tuple[RegionProps, jax.Array]:
    """RegionProps of an int32 instance label map via the run path — no CC
    (labels carry their ids): runs of constant positive label -> closed-form
    moments -> segment reductions over H*RCAP run slots keyed by label-1.

    Output contract matches `regionprops(labels, capacity)` exactly
    (area/bbox bit-exact; centroid/eccentricity to f32 tolerance); built for
    the StarDist backend where rasterized label maps hit the pixel path's
    fg-compaction + scatter costs (measured ~130 ms per 8x1024^2 batch)."""
    h, w = labels.shape
    lab = labels.astype(jnp.int32)
    left = jnp.pad(lab, ((0, 0), (1, 0)))[:, :-1]
    right = jnp.pad(lab, ((0, 0), (0, 1)))[:, 1:]
    is_start = (lab > 0) & (lab != left)
    is_end = (lab > 0) & (lab != right)
    nruns = jnp.sum(is_start.astype(jnp.int32), axis=1)
    overflow = jnp.any(nruns > rcap)

    # top_k run table (the run_table impl="topk" pattern — scatter cost
    # tracks TOTAL update volume, and the previous three full-frame
    # (h, w)->(h, rcap) scatters measured ~135 ms per 8x1024^2 batch,
    # dominating the whole StarDist stage A; two top_k's replace them).
    # The start key packs the run's label into the low digits so no gather
    # is needed to recover it: key = (w - c) * L + min(lab, capacity + 1);
    # ordering by key == ordering by column (one start flag per column),
    # and labels above `capacity` collapse into one id that routes to the
    # dump segment exactly as the previous min(seg, capacity) did.
    c = jax.lax.broadcasted_iota(jnp.int32, lab.shape, 1)
    L = capacity + 2
    plab = jnp.minimum(lab, capacity + 1)
    vs, _ = jax.lax.top_k(jnp.where(is_start, (w - c) * L + plab, 0), rcap)
    ve, _ = jax.lax.top_k(jnp.where(is_end, w - c, 0), rcap)
    start = jnp.where(vs > 0, w - vs // L, w)
    end = jnp.where(ve > 0, w - ve + 1, 0)
    run_lab = jnp.where(vs > 0, vs % L, 0)

    vf = (end > 0).reshape(-1)
    seg = jnp.where(vf, run_lab.reshape(-1) - 1, capacity)
    seg = jnp.minimum(seg, capacity)
    r = jnp.broadcast_to(
        jnp.arange(h, dtype=jnp.int32)[:, None], (h, rcap)
    ).reshape(-1)
    props = _run_moments(seg, r, start.reshape(-1), end.reshape(-1), vf,
                         capacity, h, w)
    return props, overflow


@partial(jax.jit, static_argnames=("rcap", "connectivity", "impl"))
def labels_from_mask(
    mask: jax.Array, rcap: int = 64, connectivity: int = 1, impl: str = "topk"
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(labels, count, overflow): the full int32 label map in scipy numbering
    via the run path — the API/test counterpart of label_components; the
    production pipeline uses regionprops_from_mask and never materializes
    this.  Per-pixel mapping is a row-wise take_along_axis of the component
    table at each pixel's run rank."""
    h, w = mask.shape
    table = run_table(mask, rcap=rcap, impl=impl)
    parent = cc_runs(table, connectivity=connectivity)
    comp, count = _component_numbers(parent, table.end > 0)

    is_start, _ = _start_end_flags(mask)
    rank = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    rank_c = jnp.clip(rank, 0, rcap - 1)
    lab = jnp.take_along_axis(comp, rank_c, axis=1)
    return jnp.where(mask, lab, 0), count, table.overflow
