#!/usr/bin/env python
"""Probe the run-length (row-run) CC + regionprops design on TPU.

Idea: the production bottlenecks (BENCH.md) are pixel-level CC (~165 ms) and
fg-pixel compaction + scatter regionprops (~120 ms) on 8x1024^2 batches.  Row
runs give a ~32x smaller domain: per-pixel run metadata comes from axis-wise
cumsums (no scatter), CC becomes neighbor-min hook iterations over a
[H, RCAP] run table (tiny fused passes), and moments are closed-form per run.

Measures: run-table extraction variants (scatter / top_k / sort), hook-CC
convergence + cost, run-based regionprops, and exactness vs the current
label_components + regionprops path.
"""
import os, sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax

if os.environ.get("PROBE_CPU"):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import binary_opening
from cell_image_analysis_tpu.ops.cc import label_components
from cell_image_analysis_tpu.ops.percentile import normalize_percentile
from cell_image_analysis_tpu.ops.regionprops import regionprops
from cell_image_analysis_tpu.utils.bench import _make_frames

B, H, W = (2, 512, 512) if os.environ.get("PROBE_CPU") else (8, 1024, 1024)
RCAP = 64
INF = jnp.int32(1 << 30)

frames = _make_frames(B, H, 80 if H == 1024 else 25)
stack = np.stack(frames)
segs = jnp.asarray(stack[..., 2].astype(np.float32))


def t(name, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)


@jax.jit
def masks_of(segs):
    def one(seg):
        norm = normalize_percentile(seg)
        thr = jnp.percentile(norm, 90.0)
        return binary_opening(norm > thr)
    return jax.vmap(one)(segs)


masks = masks_of(segs)
_ = float(masks.sum())

# ---- per-pixel run metadata (axis-wise only) --------------------------------
def _meta(mask):
    left = jnp.pad(mask, ((0, 0), (1, 0)))[:, :-1]
    right = jnp.pad(mask, ((0, 0), (0, 1)))[:, 1:]
    is_start = mask & ~left
    is_end = mask & ~right
    rank = jnp.cumsum(is_start.astype(jnp.int32), axis=1) - 1
    return is_start, is_end, rank


@jax.jit
def meta_only(masks):
    s, e, r = jax.vmap(_meta)(masks)
    return s.sum() + e.sum() + r.sum()


@jax.jit
def max_runs(masks):
    def one(mask):
        is_start, _, _ = _meta(mask)
        return jnp.max(jnp.sum(is_start.astype(jnp.int32), axis=1))
    return jnp.max(jax.vmap(one)(masks))


print("max runs/row over bench masks:", int(max_runs(masks)), flush=True)
t("run metadata x8          ", lambda: float(meta_only(masks)))

# ---- run-table extraction variants ------------------------------------------
def _table_topk(mask):
    is_start, is_end, _ = _meta(mask)
    c = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    ks = jnp.where(is_start, W - c, 0)
    ke = jnp.where(is_end, W - c, 0)
    vs, _ = jax.lax.top_k(ks, RCAP)
    ve, _ = jax.lax.top_k(ke, RCAP)
    start = jnp.where(vs > 0, W - vs, W)
    end = jnp.where(ve > 0, W - ve + 1, 0)
    return start, end


def _table_scatter(mask):
    is_start, is_end, rank = _meta(mask)
    c = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    r = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0)
    js = jnp.where(is_start, jnp.minimum(rank, RCAP), RCAP)
    je = jnp.where(is_end, jnp.minimum(rank, RCAP), RCAP)
    start = jnp.full((H, RCAP + 1), W, jnp.int32).at[r.ravel(), js.ravel()].set(c.ravel())[:, :RCAP]
    end = jnp.zeros((H, RCAP + 1), jnp.int32).at[r.ravel(), je.ravel()].set(c.ravel() + 1)[:, :RCAP]
    return start, end


def _table_sort(mask):
    is_start, is_end, _ = _meta(mask)
    c = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    ks = jnp.where(is_start, c, W)
    ke = jnp.where(is_end, c + 1, 0)
    start = jax.lax.sort(ks, dimension=1)[:, :RCAP]
    end = -jax.lax.sort(-ke, dimension=1)[:, ::-1][:, :RCAP]  # ascending of valid ends
    return start, end


@jax.jit
def topk_x8(masks):
    s, e = jax.vmap(_table_topk)(masks)
    return s.sum() + e.sum()


@jax.jit
def scatter_x8(masks):
    s, e = jax.vmap(_table_scatter)(masks)
    return s.sum() + e.sum()


@jax.jit
def sort_x8(masks):
    s, e = jax.vmap(_table_sort)(masks)
    return s.sum() + e.sum()


t("table extraction topk x8 ", lambda: float(topk_x8(masks)))
t("table extraction scatter ", lambda: float(scatter_x8(masks)))
t("table extraction sort x8 ", lambda: float(sort_x8(masks)))

sa, ea = jax.vmap(_table_topk)(masks)
sb, eb = jax.vmap(_table_scatter)(masks)
# scatter end sentinel vs topk: compare valid slots only
va = np.asarray(sa) < W
print("topk==scatter starts:", bool((np.asarray(sa) == np.asarray(sb)).all()),
      "ends:", bool((np.asarray(ea)[va] == np.asarray(eb)[va]).all()), flush=True)

# ---- hook CC over the run table ---------------------------------------------
def _shift_rows(x, off, fill):
    return jnp.pad(x, ((1, 1), (0, 0)), constant_values=fill)[1 + off : 1 + off + x.shape[0]]


def _cc_runs(start, end, conn=1, check_every=4, max_iters=4096):
    valid = start < W
    own = (jnp.arange(H, dtype=jnp.int32)[:, None] * RCAP
           + jnp.arange(RCAP, dtype=jnp.int32)[None, :])
    p0 = jnp.where(valid, own, INF)
    d = jnp.int32(1 if conn == 2 else 0)
    s_up = _shift_rows(start, -1, W)
    e_up = _shift_rows(end, -1, 0)
    s_dn = _shift_rows(start, 1, W)
    e_dn = _shift_rows(end, 1, 0)
    ov_up = (start[:, :, None] < e_up[:, None, :] + d) & (s_up[:, None, :] < end[:, :, None] + d)
    ov_dn = (start[:, :, None] < e_dn[:, None, :] + d) & (s_dn[:, None, :] < end[:, :, None] + d)

    def cond(st):
        return st[1]

    def body(st):
        p, _, it = st
        new = p
        for _ in range(check_every):
            p_up = _shift_rows(new, -1, INF)
            p_dn = _shift_rows(new, 1, INF)
            m_up = jnp.min(jnp.where(ov_up, p_up[:, None, :], INF), axis=2)
            m_dn = jnp.min(jnp.where(ov_dn, p_dn[:, None, :], INF), axis=2)
            new = jnp.minimum(new, jnp.minimum(m_up, m_dn))
        return new, jnp.any(new != p), it + check_every

    p, _, iters = jax.lax.while_loop(cond, body, (p0, jnp.any(p0 >= 0), jnp.int32(0)))
    return jnp.where(valid, p, INF), iters


def _cc_runs_jump(start, end, conn=1, check_every=4):
    """Hook iterations + a pointer-double (p = p[p]) each round."""
    valid = start < W
    own = (jnp.arange(H, dtype=jnp.int32)[:, None] * RCAP
           + jnp.arange(RCAP, dtype=jnp.int32)[None, :])
    p0 = jnp.where(valid, own, INF)
    d = jnp.int32(1 if conn == 2 else 0)
    s_up = _shift_rows(start, -1, W)
    e_up = _shift_rows(end, -1, 0)
    s_dn = _shift_rows(start, 1, W)
    e_dn = _shift_rows(end, 1, 0)
    ov_up = (start[:, :, None] < e_up[:, None, :] + d) & (s_up[:, None, :] < end[:, :, None] + d)
    ov_dn = (start[:, :, None] < e_dn[:, None, :] + d) & (s_dn[:, None, :] < end[:, :, None] + d)

    def cond(st):
        return st[1]

    def body(st):
        p, _, it = st
        new = p
        for _ in range(check_every):
            p_up = _shift_rows(new, -1, INF)
            p_dn = _shift_rows(new, 1, INF)
            m_up = jnp.min(jnp.where(ov_up, p_up[:, None, :], INF), axis=2)
            m_dn = jnp.min(jnp.where(ov_dn, p_dn[:, None, :], INF), axis=2)
            new = jnp.minimum(new, jnp.minimum(m_up, m_dn))
        flat = new.reshape(-1)
        jumped = flat[jnp.minimum(flat, H * RCAP - 1)].reshape(H, RCAP)
        new = jnp.where(valid, jnp.minimum(new, jumped), INF)
        return new, jnp.any(new != p), it + check_every

    p, _, iters = jax.lax.while_loop(cond, body, (p0, jnp.any(p0 >= 0), jnp.int32(0)))
    return jnp.where(valid, p, INF), iters


@jax.jit
def cc_runs_x8(masks):
    def one(mask):
        s, e = _table_topk(mask)
        p, it = _cc_runs(s, e)
        return p, it
    return jax.vmap(one)(masks)


@jax.jit
def cc_runs_jump_x8(masks):
    def one(mask):
        s, e = _table_topk(mask)
        p, it = _cc_runs_jump(s, e)
        return p, it
    return jax.vmap(one)(masks)


p8, it8 = cc_runs_x8(masks)
print("hook-CC iterations per frame:", np.asarray(it8).tolist(), flush=True)
pj8, itj8 = cc_runs_jump_x8(masks)
print("hook-CC+jump iterations:     ", np.asarray(itj8).tolist(), flush=True)
t("run CC (extract+hook) x8 ", lambda: float(cc_runs_x8(masks)[0].sum()))
t("run CC + pointer jump x8 ", lambda: float(cc_runs_jump_x8(masks)[0].sum()))

# ---- run-based regionprops ---------------------------------------------------
CAPACITY = 4096


def _props_runs(mask):
    s, e = _table_topk(mask)
    p, _ = _cc_runs(s, e)
    valid = s < W
    # renumber roots 1..K in raster order (== scipy order)
    own = (jnp.arange(H, dtype=jnp.int32)[:, None] * RCAP
           + jnp.arange(RCAP, dtype=jnp.int32)[None, :])
    flatp = p.reshape(-1)
    is_root = valid.reshape(-1) & (flatp == own.reshape(-1))
    cnum = jnp.cumsum(is_root.astype(jnp.int32))
    comp = jnp.where(valid.reshape(-1), cnum[jnp.minimum(flatp, H * RCAP - 1)], 0)
    seg = jnp.where(comp > 0, comp - 1, CAPACITY)
    seg = jnp.minimum(seg, CAPACITY)

    r = jnp.broadcast_to(jnp.arange(H, dtype=jnp.int32)[:, None], (H, RCAP)).reshape(-1)
    sf = s.reshape(-1)
    ef = e.reshape(-1)
    ln = jnp.where(valid.reshape(-1), ef - sf, 0)

    mx = jax.ops.segment_max(
        jnp.stack([r, ef - 1, -r, -sf], axis=1), seg, num_segments=CAPACITY + 1
    )[:CAPACITY]
    mxr, mxc = mx[:, 0], mx[:, 1]
    mnr, mnc = -mx[:, 2], -mx[:, 3]
    ar = jnp.concatenate([jnp.clip(mnr, 0, H - 1), jnp.zeros((1,), jnp.int32)])
    ac = jnp.concatenate([jnp.clip(mnc, 0, W - 1), jnp.zeros((1,), jnp.int32)])

    lnf = ln.astype(jnp.float32)
    dr = (r - ar[seg]).astype(jnp.float32)
    c0 = (sf - ac[seg]).astype(jnp.float32)  # first col offset
    # closed-form per-run sums of dc = c0..c0+ln-1
    sum_dc = lnf * c0 + lnf * (lnf - 1.0) / 2.0
    sum_dc2 = (lnf * c0 * c0 + 2.0 * c0 * (lnf * (lnf - 1.0) / 2.0)
               + (lnf - 1.0) * lnf * (2.0 * lnf - 1.0) / 6.0)
    data = jnp.stack(
        [lnf, dr * lnf, sum_dc, dr * dr * lnf, sum_dc2, dr * sum_dc], axis=1
    )
    sums = jax.ops.segment_sum(data, seg, num_segments=CAPACITY + 1)[:CAPACITY]
    return mnr, mnc, mxr, mxc, sums


@jax.jit
def props_runs_x8(masks):
    return jax.vmap(_props_runs)(masks)


@jax.jit
def labels_current_x8(masks):
    return jax.vmap(lambda m: label_components(m)[0])(masks)


@jax.jit
def props_current_x8(masks):
    labels = jax.vmap(lambda m: label_components(m)[0])(masks)
    return jax.vmap(lambda l: regionprops(l, capacity=CAPACITY, fg_fraction=0.12))(labels)


t("CC current (scan) x8     ", lambda: float(labels_current_x8(masks).sum()))
t("props current (CC+props) ", lambda: float(props_current_x8(masks).area.sum()))
t("props via runs x8        ", lambda: float(props_runs_x8(masks)[4].sum()))

# ---- exactness ----------------------------------------------------------------
cur = props_current_x8(masks)
mnr, mnc, mxr, mxc, sums = props_runs_x8(masks)
area_r = np.asarray(sums[..., 0]).astype(np.int64)
area_c = np.asarray(cur.area).astype(np.int64)
print("area equal:", bool((area_r == area_c).all()), flush=True)
v = area_c > 0
print("bbox equal:",
      bool((np.asarray(mnr)[v] == np.asarray(cur.min_r)[v]).all()
           and (np.asarray(mnc)[v] == np.asarray(cur.min_c)[v]).all()
           and (np.asarray(mxr)[v] + 1 == np.asarray(cur.max_r)[v]).all()
           and (np.asarray(mxc)[v] + 1 == np.asarray(cur.max_c)[v]).all()),
      flush=True)
# centroid parity
er = np.asarray(sums[..., 1]) / np.maximum(area_r, 1)
cy = np.asarray(mnr) + er
print("centroid_r max diff:", float(np.abs(cy[v] - np.asarray(cur.centroid_r)[v]).max()), flush=True)
