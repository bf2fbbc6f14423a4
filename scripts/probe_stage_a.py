#!/usr/bin/env python
"""Decompose stage-A costs on TPU: fg-compaction nonzero vs segment ops in
regionprops; CC sweep loop vs a pointer-jump hybrid."""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import threshold_segment
from cell_image_analysis_tpu.ops.cc import label_components, _neighbor_min
from cell_image_analysis_tpu.ops.percentile import normalize_percentile
from cell_image_analysis_tpu.utils.bench import _make_frames

frames = _make_frames(8, 1024, 80)
stack = np.stack(frames)
segs = jnp.asarray(stack[..., 2].astype(np.float32))

H = W = 1024
FG = 262144


def t(name, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)


@jax.jit
def seg_labels(segs):
    return jax.vmap(threshold_segment)(segs)


labels = seg_labels(segs)
_ = float(labels.sum())


@jax.jit
def nonzero_only(labels):
    def one(l):
        return jnp.nonzero(l.reshape(-1) > 0, size=FG, fill_value=H * W)[0]
    return jax.vmap(one)(labels)


@jax.jit
def searchsorted_compact(labels):
    def one(l):
        m = (l.reshape(-1) > 0).astype(jnp.int32)
        cs = jnp.cumsum(m)  # cs[i] = # fg in [0, i]
        q = jnp.arange(1, FG + 1)
        idx = jnp.searchsorted(cs, q, side="left")
        return jnp.minimum(idx, H * W)
    return jax.vmap(one)(labels)


@jax.jit
def segops_only(labels, fgidx):
    def one(l, fgi):
        flat = l.reshape(-1)
        in_fg = fgi < H * W
        fgi_c = jnp.minimum(fgi, H * W - 1)
        lab = jnp.where(in_fg, flat[fgi_c], 0)
        seg = jnp.where(lab - 1 < 0, 4096, lab - 1)
        rr = (fgi_c // W).astype(jnp.float32)
        cc = (fgi_c % W).astype(jnp.float32)
        s1 = jax.ops.segment_sum(jnp.stack([jnp.ones_like(rr), rr, cc], 1), seg, num_segments=4097)
        mx = jax.ops.segment_max(jnp.stack([fgi_c // W, fgi_c % W, -(fgi_c // W), -(fgi_c % W)], 1), seg, num_segments=4097)
        s2 = jax.ops.segment_sum(jnp.stack([rr * rr, cc * cc, rr * cc], 1), seg, num_segments=4097)
        return s1.sum() + mx.sum() + s2.sum()
    return jax.vmap(one)(labels, fgidx)


fgidx = nonzero_only(labels)
_ = float(fgidx.sum())

t("nonzero compaction x8    ", lambda: float(nonzero_only(labels).sum()))
t("searchsorted compaction x8", lambda: float(searchsorted_compact(labels).sum()))
t("segment ops only x8      ", lambda: float(segops_only(labels, fgidx).sum()))

# sanity: same indices
a = np.asarray(nonzero_only(labels))
b = np.asarray(searchsorted_compact(labels))
print("compaction equal:", bool((a == b).all()), flush=True)

# ---- CC variants ------------------------------------------------------------
@jax.jit
def masks_of(segs):
    def one(seg):
        norm = normalize_percentile(seg)
        thr = jnp.percentile(norm, 90.0)
        m = norm > thr
        # same opening as threshold_segment default
        from cell_image_analysis_tpu.models.segmentation import binary_opening
        return binary_opening(m)
    return jax.vmap(one)(segs)


try:
    masks = masks_of(segs)
    _ = float(masks.sum())
except Exception as e:
    print("masks_of failed (private api?):", e, flush=True)
    masks = None

if masks is not None:
    @jax.jit
    def cc_current(masks):
        return jax.vmap(lambda m: label_components(m)[0])(masks)

    @jax.jit
    def cc_jump(masks):
        def one(mask):
            h, w = mask.shape
            idx = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0) * w + \
                  jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
            lbl0 = jnp.where(mask, idx + 1, 0)

            def cond(state):
                _, changed = state
                return changed

            def body(state):
                lbl, _ = state
                new = lbl
                for _ in range(2):
                    nm = _neighbor_min(new, 1)
                    new = jnp.where(mask, jnp.minimum(jnp.where(new > 0, new, 0x7FFFFFFF), nm), 0)
                    new = jnp.where(new == 0x7FFFFFFF, 0, new)
                for _ in range(2):  # pointer jumps: label -> label of its root pixel
                    flat = new.reshape(-1)
                    jumped = flat[jnp.maximum(flat - 1, 0)]
                    new = jnp.where(mask, jumped.reshape(h, w), 0)
                return new, jnp.any(new != lbl)

            lbl, _ = jax.lax.while_loop(cond, body, (lbl0, jnp.bool_(True)))
            flat = lbl.reshape(-1)
            is_root = jnp.zeros(h * w + 1, dtype=jnp.int32).at[flat].set(1).at[0].set(0)
            prefix = jnp.cumsum(is_root)
            return jnp.where(mask, prefix[flat].reshape(h, w), 0)
        return jax.vmap(one)(masks)

    t("CC min-propagation x8    ", lambda: float(cc_current(masks).sum()))
    t("CC + pointer jumps x8    ", lambda: float(cc_jump(masks).sum()))
    same = bool((np.asarray(cc_current(masks)) == np.asarray(cc_jump(masks))).all())
    print("cc equal:", same, flush=True)
