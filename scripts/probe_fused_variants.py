#!/usr/bin/env python
"""Isolate why score_frames_fused underperforms the chunked path on TPU.

Builds the bench workload's stage-A outputs once, then times:
  A. 3 separate preprocess_gather_score dispatches (the chunked inner path)
  B. one jitted dynamic fori_loop over the same chunks, scatter .at[ids].set
  C. same loop, results written with dynamic_update_slice into a chunk slab
  D. same loop, body WITHOUT the scoring work (loop mechanics only)
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import threshold_segment
from cell_image_analysis_tpu.ops.clahe import clahe_cells
from cell_image_analysis_tpu.ops.extract import extract_candidates, preprocess_gather_score
from cell_image_analysis_tpu.ops.resize import resize_cells
from cell_image_analysis_tpu.pipeline.scoring import score_cells
from cell_image_analysis_tpu.utils.bench import _fit_params, _make_frames

CHUNK = 256
D = 9 + 27
KW = dict(label_capacity=4096, cell_capacity=128)

model, params, _ = _fit_params()
frames = _make_frames(8, 1024, 80)
stack = np.stack(frames)
segs = jnp.asarray(stack[..., 2].astype(np.float32))
greens = jnp.asarray(stack[..., 1].astype(np.float32))


@jax.jit
def stage_a(segs, greens):
    def one(seg, green):
        labels = threshold_segment(seg)
        cand = extract_candidates(labels, green, **KW)
        return cand.crops, cand.heights, cand.widths, cand.valid
    return jax.vmap(one)(segs, greens)


crops, heights, widths, valid = stage_a(segs, greens)
B, ccap, full_cap = crops.shape[0], crops.shape[1], crops.shape[-1]
N = B * ccap
crops = crops.reshape(N, full_cap, full_cap)
heights = heights.reshape(-1)
widths = widths.reshape(-1)
valid = valid.reshape(-1)
hs, ws, vv = (np.asarray(x) for x in (heights, widths, valid))
pool = np.flatnonzero(vv)
small = pool[(hs[pool] <= 96) & (ws[pool] <= 96)]
large = pool[(hs[pool] > 96) | (ws[pool] > 96)]
print(f"pool={len(pool)} small={len(small)} large={len(large)}")


def timeit(name, fn, reps=3):
    t0 = time.perf_counter()
    fn()  # warm
    print(f"{name}: warm+compile {time.perf_counter()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)


# ---- A: chunked dispatches -------------------------------------------------
def variant_a():
    pending = []
    for bucket, cap_b in ((small, 96), (large, full_cap)):
        for start in range(0, len(bucket), CHUNK):
            take = bucket[start : start + CHUNK]
            idx = np.full(CHUNK, take[0], np.int32)
            idx[: len(take)] = take
            s = preprocess_gather_score(model, params, crops, heights, widths,
                                        jnp.asarray(idx), cap_b)
            pending.append(s)
    return float(sum(float(s.sum()) for s in pending))


# ---- shared loop machinery ---------------------------------------------------
pad_len = (-(-N // CHUNK)) * CHUNK


def bucket_dev(mask):
    idx = jnp.nonzero(mask, size=N, fill_value=N)[0]
    return jnp.pad(idx, (0, pad_len - N), constant_values=N), jnp.sum(mask.astype(jnp.int32))


is_small = (heights <= 96) & (widths <= 96)
small_idx, n_small = bucket_dev(valid & is_small)
large_idx, n_large = bucket_dev(valid & ~is_small)


def chunk_scores(ids, cap_b):
    ids_c = jnp.minimum(ids, N - 1)
    c = crops[ids_c][:, :cap_b, :cap_b]
    h = heights[ids_c]
    w = widths[ids_c]
    eq = clahe_cells(c, h, w)
    cells = resize_cells(eq, h, w, out_size=64)
    s = score_cells(model, params, cells[..., None])
    return jnp.concatenate(
        [s.reconstruction_mse[:, None], s.reconstruction_mae[:, None],
         s.conservative_predictions[:, None].astype(jnp.float32),
         s.moderate_predictions[:, None].astype(jnp.float32),
         s.conservative_scores[:, None], s.moderate_scores[:, None],
         s.ensemble_predictions[:, None].astype(jnp.float32),
         s.fft_predictions[:, None].astype(jnp.float32),
         s.fft_scores[:, None], s.fft], axis=1)


@jax.jit
def variant_b(small_idx, n_small, large_idx, n_large):
    out = jnp.zeros((N + 1, D), jnp.float32)

    def run(out, idx_arr, n, cap_b):
        def body(i, out):
            ids = jax.lax.dynamic_slice(idx_arr, (i * CHUNK,), (CHUNK,))
            return out.at[ids].set(chunk_scores(ids, cap_b))
        return jax.lax.fori_loop(0, (n + CHUNK - 1) // CHUNK, body, out)

    out = run(out, small_idx, n_small, 96)
    out = run(out, large_idx, n_large, full_cap)
    return out


@jax.jit
def variant_c(small_idx, n_small, large_idx, n_large):
    n_slabs = pad_len // CHUNK
    out = jnp.zeros((2 * n_slabs, CHUNK, D), jnp.float32)

    def run(out, idx_arr, n, cap_b, slab0):
        def body(i, out):
            ids = jax.lax.dynamic_slice(idx_arr, (i * CHUNK,), (CHUNK,))
            rows = chunk_scores(ids, cap_b)
            return jax.lax.dynamic_update_slice(out, rows[None], (slab0 + i, 0, 0))
        return jax.lax.fori_loop(0, (n + CHUNK - 1) // CHUNK, body, out)

    out = run(out, small_idx, n_small, 96, 0)
    out = run(out, large_idx, n_large, full_cap, n_slabs)
    return out


@jax.jit
def variant_d(small_idx, n_small, large_idx, n_large):
    out = jnp.zeros((N + 1, D), jnp.float32)

    def run(out, idx_arr, n, cap_b):
        def body(i, out):
            ids = jax.lax.dynamic_slice(idx_arr, (i * CHUNK,), (CHUNK,))
            ids_c = jnp.minimum(ids, N - 1)
            c = crops[ids_c][:, :cap_b, :cap_b]
            rows = jnp.zeros((CHUNK, D), jnp.float32) + jnp.mean(c)
            return out.at[ids].set(rows)
        return jax.lax.fori_loop(0, (n + CHUNK - 1) // CHUNK, body, out)

    out = run(out, small_idx, n_small, 96)
    out = run(out, large_idx, n_large, full_cap)
    return out


which = set(sys.argv[1]) if len(sys.argv) > 1 else set("abcd")
if "a" in which:
    timeit("A chunked dispatches   ", variant_a)
if "b" in which:
    timeit("B loop + scatter       ", lambda: float(variant_b(small_idx, n_small, large_idx, n_large).sum()))
if "c" in which:
    timeit("C loop + DUS slab      ", lambda: float(variant_c(small_idx, n_small, large_idx, n_large).sum()))
if "d" in which:
    timeit("D loop mechanics only  ", lambda: float(variant_d(small_idx, n_small, large_idx, n_large).sum()))
