#!/usr/bin/env python
"""Decompose the fused chunk-scoring loop (~110 ms/batch after the run-length
stage A landed): gather -> CLAHE -> resize -> CAE/scaler/PCA/SVM/FFT scoring.

Times the bench workload's chunk loop with body components ablated:
  full      — the production body (baseline)
  noscore   — gather+CLAHE+resize only
  noclahe   — gather+resize+score (CLAHE skipped)
  noresize  — gather+CLAHE, crop center-padded to 64 (resize skipped)
  scoreonly — score a pre-resized dummy pool (loop + CAE/SVM/FFT only)
  gather    — gather only
All timings include the ~34 ms host fetch floor; compare deltas.

Usage: python scripts/probe_chunk_body.py [subset-letters]
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import threshold_mask
from cell_image_analysis_tpu.ops.clahe import clahe_cells
from cell_image_analysis_tpu.ops.extract import extract_candidates_from_mask
from cell_image_analysis_tpu.ops.resize import resize_cells
from cell_image_analysis_tpu.pipeline.scoring import score_cells
from cell_image_analysis_tpu.utils.bench import _fit_params, _make_frames

CHUNK = 32
CAPS = (64, 96)
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
        cand, _ = extract_candidates_from_mask(threshold_mask(seg), green, **KW)
        return cand.crops, cand.heights, cand.widths, cand.valid

    return jax.vmap(one)(segs, greens)


crops, heights, widths, valid = stage_a(segs, greens)
B, ccap, full_cap = crops.shape[0], crops.shape[1], crops.shape[-1]
N = B * ccap
crops = crops.reshape(N, full_cap, full_cap)
heights = heights.reshape(-1)
widths = widths.reshape(-1)
valid = valid.reshape(-1)
pad_len = (-(-N // CHUNK)) * CHUNK


def bucket_dev(mask):
    idx = jnp.nonzero(mask, size=N, fill_value=N)[0]
    return jnp.pad(idx, (0, pad_len - N), constant_values=N), jnp.sum(mask.astype(jnp.int32))


fits64 = (heights <= 64) & (widths <= 64)
fits96 = (heights <= 96) & (widths <= 96)
b64_idx, n64 = bucket_dev(valid & fits64)
b96_idx, n96 = bucket_dev(valid & fits96 & ~fits64)
bfull_idx, nfull = bucket_dev(valid & ~fits96)
print(f"pool={int(np.asarray(valid).sum())} n64={int(n64)} n96={int(n96)} nfull={int(nfull)}",
      flush=True)

BUCKETS = ((b64_idx, n64, 64), (b96_idx, n96, 96), (bfull_idx, nfull, full_cap))
dummy_cells = jnp.zeros((N, 64, 64), jnp.float32) + 0.5


def make_loop(body):
    """fori_loop over all three buckets with the given per-chunk body
    (ids, cap_b) -> (CHUNK, D) rows."""

    def run_all():
        out = jnp.zeros((N + 1, D), jnp.float32)

        def run(out, idx_arr, n, cap_b):
            def step(i, out):
                ids = jax.lax.dynamic_slice(idx_arr, (i * CHUNK,), (CHUNK,))
                return out.at[ids].set(body(ids, cap_b))

            return jax.lax.fori_loop(0, (n + CHUNK - 1) // CHUNK, step, out)

        for idx_arr, n, cap_b in BUCKETS:
            out = run(out, idx_arr, n, cap_b)
        return out

    return run_all


def score_rows(cells):
    s = score_cells(model, params, cells[..., None])
    return jnp.concatenate(
        [s.reconstruction_mse[:, None], s.reconstruction_mae[:, None],
         s.conservative_predictions[:, None].astype(jnp.float32),
         s.moderate_predictions[:, None].astype(jnp.float32),
         s.conservative_scores[:, None], s.moderate_scores[:, None],
         s.ensemble_predictions[:, None].astype(jnp.float32),
         s.fft_predictions[:, None].astype(jnp.float32),
         s.fft_scores[:, None], s.fft], axis=1)


def gather(ids, cap_b):
    ids_c = jnp.minimum(ids, N - 1)
    return crops[ids_c][:, :cap_b, :cap_b], heights[ids_c], widths[ids_c]


def body_full(ids, cap_b):
    c, h, w = gather(ids, cap_b)
    eq = clahe_cells(c, h, w)
    return score_rows(resize_cells(eq, h, w, out_size=64))


def body_noscore(ids, cap_b):
    c, h, w = gather(ids, cap_b)
    cells = resize_cells(clahe_cells(c, h, w), h, w, out_size=64)
    return jnp.zeros((CHUNK, D), jnp.float32) + jnp.mean(cells)


def body_noclahe(ids, cap_b):
    c, h, w = gather(ids, cap_b)
    return score_rows(resize_cells(c, h, w, out_size=64))


def body_noresize(ids, cap_b):
    c, h, w = gather(ids, cap_b)
    eq = clahe_cells(c, h, w)
    return jnp.zeros((CHUNK, D), jnp.float32) + jnp.mean(eq)


def body_scoreonly(ids, cap_b):
    ids_c = jnp.minimum(ids, N - 1)
    return score_rows(dummy_cells[ids_c])


def body_gather(ids, cap_b):
    c, h, w = gather(ids, cap_b)
    return jnp.zeros((CHUNK, D), jnp.float32) + jnp.mean(c)


def make_impl_body(impl):
    def body(ids, cap_b):
        c, h, w = gather(ids, cap_b)
        eq = clahe_cells(c, h, w, impl=impl)
        return score_rows(resize_cells(eq, h, w, out_size=64))

    return body


VARIANTS = dict(
    f=("full     ", jax.jit(make_loop(body_full))),
    n=("noscore  ", jax.jit(make_loop(body_noscore))),
    c=("noclahe  ", jax.jit(make_loop(body_noclahe))),
    r=("noresize ", jax.jit(make_loop(body_noresize))),
    s=("scoreonly", jax.jit(make_loop(body_scoreonly))),
    g=("gather   ", jax.jit(make_loop(body_gather))),
    S=("cl=scat  ", jax.jit(make_loop(make_impl_body("scatter")))),
    M=("cl=sc+mxu", jax.jit(make_loop(make_impl_body("scatter+mxu")))),
    X=("cl=mxu+sc", jax.jit(make_loop(make_impl_body("mxu+scatter")))),
    P=("cl=pallas", jax.jit(make_loop(make_impl_body("pallas")))),
)


def _make_noclip_variant():
    """Timing-only: replace the Zuiderveld clip while_loop with a plain
    minimum (NOT semantically equivalent) to isolate its cost.  The patch
    must be active when the jit traces, so trace+compile eagerly here."""
    from cell_image_analysis_tpu.ops import clahe as _clahe_mod

    orig = _clahe_mod._clip_histogram
    _clahe_mod._clip_histogram = lambda h, clim, nbins: jnp.minimum(h, clim)
    try:
        fn = jax.jit(make_loop(make_impl_body("mxu")))
        float(fn().sum())  # force trace + compile under the patch
    finally:
        _clahe_mod._clip_histogram = orig
    return fn


VARIANTS["C"] = ("cl=noclip", _make_noclip_variant)  # callable: built on demand


def _clip_rankmm(hist, clim, nbins):
    """Exact _clip_histogram with the per-iteration cumsum replaced by a
    lower-triangular ones matmul (rank = eligible @ L^T, counts <= 256
    exact in f32) — MXU instead of the log-depth cumsum lowering."""
    L = jnp.tril(jnp.ones((nbins, nbins), jnp.float32))
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
        rank = (eligible.astype(jnp.float32) @ L.T).astype(jnp.int32)
        add = eligible & (rank <= ne)
        h = h + add.astype(jnp.int32)
        n_added = jnp.sum(add.astype(jnp.int32))
        return h, ne - n_added, n_added

    added0 = jnp.maximum(jnp.int32(1), n_excess * 0)
    hist, _, _ = jax.lax.while_loop(cond, body, (hist, n_excess, added0))
    return hist


def _clip_i16(hist, clim, nbins):
    """Exact _clip_histogram carried in int16 (all values <= 576 < 2^15)."""
    i16 = jnp.int16
    hist16 = hist.astype(i16)
    clim16 = clim.astype(i16)
    excess = jnp.where(hist16 > clim16, hist16 - clim16, i16(0))
    n_excess = jnp.sum(excess.astype(jnp.int32)).astype(i16)
    hist16 = jnp.minimum(hist16, clim16)
    bin_incr = (n_excess.astype(jnp.int32) // nbins).astype(i16)
    upper = clim16 - bin_incr
    low = hist16 < upper
    n_excess = n_excess - (jnp.sum(low.astype(jnp.int32)) * bin_incr.astype(jnp.int32)).astype(i16)
    hist16 = jnp.where(low, hist16 + bin_incr, hist16)
    mid = (hist16 >= upper) & (hist16 < clim16)
    n_excess = n_excess + jnp.sum(jnp.where(mid, hist16 - clim16, i16(0)).astype(jnp.int32)).astype(i16)
    hist16 = jnp.where(mid, clim16, hist16)
    bin_ids = jnp.arange(nbins, dtype=jnp.int32)

    def cond(state):
        h, ne, added = state
        return (ne > 0) & (added > 0)

    def body(state):
        h, ne, _ = state
        step = jnp.maximum(1, nbins // jnp.maximum(ne.astype(jnp.int32), 1))
        eligible = (h < clim16) & (bin_ids % step == 0)
        rank = jnp.cumsum(eligible.astype(i16))
        add = eligible & (rank <= ne)
        h = h + add.astype(i16)
        n_added = jnp.sum(add.astype(jnp.int32)).astype(i16)
        return h, ne - n_added, n_added

    added0 = jnp.maximum(i16(1), n_excess * i16(0))
    hist16, _, _ = jax.lax.while_loop(cond, body, (hist16, n_excess, added0))
    return hist16.astype(jnp.int32)


def _make_clip_variant(clip_fn):
    def build():
        from cell_image_analysis_tpu.ops import clahe as _clahe_mod

        orig = _clahe_mod._clip_histogram
        _clahe_mod._clip_histogram = clip_fn
        try:
            fn = jax.jit(make_loop(make_impl_body("mxu")))
            float(fn().sum())
        finally:
            _clahe_mod._clip_histogram = orig
        return fn

    return build


def _clip_i16_rankmm(hist, clim, nbins):
    """Exact _clip_histogram in int16 with the rank cumsum as an f32
    triangular matmul (both transformations independently verified exact)."""
    i16 = jnp.int16
    L = jnp.tril(jnp.ones((nbins, nbins), jnp.float32))
    hist16 = hist.astype(i16)
    clim16 = clim.astype(i16)
    excess = jnp.where(hist16 > clim16, hist16 - clim16, i16(0))
    n_excess = jnp.sum(excess.astype(jnp.int32)).astype(i16)
    hist16 = jnp.minimum(hist16, clim16)
    bin_incr = (n_excess.astype(jnp.int32) // nbins).astype(i16)
    upper = clim16 - bin_incr
    low = hist16 < upper
    n_excess = n_excess - (jnp.sum(low.astype(jnp.int32)) * bin_incr.astype(jnp.int32)).astype(i16)
    hist16 = jnp.where(low, hist16 + bin_incr, hist16)
    mid = (hist16 >= upper) & (hist16 < clim16)
    n_excess = n_excess + jnp.sum(jnp.where(mid, hist16 - clim16, i16(0)).astype(jnp.int32)).astype(i16)
    hist16 = jnp.where(mid, clim16, hist16)
    bin_ids = jnp.arange(nbins, dtype=jnp.int32)

    def cond(state):
        h, ne, added = state
        return (ne > 0) & (added > 0)

    def body(state):
        h, ne, _ = state
        step = jnp.maximum(1, nbins // jnp.maximum(ne.astype(jnp.int32), 1))
        eligible = (h < clim16) & (bin_ids % step == 0)
        rank = (eligible.astype(jnp.float32) @ L.T).astype(i16)
        add = eligible & (rank <= ne)
        h = h + add.astype(i16)
        n_added = jnp.sum(add.astype(jnp.int32)).astype(i16)
        return h, ne - n_added, n_added

    added0 = jnp.maximum(i16(1), n_excess * i16(0))
    hist16, _, _ = jax.lax.while_loop(cond, body, (hist16, n_excess, added0))
    return hist16.astype(jnp.int32)


VARIANTS["R"] = ("cl=rankmm", _make_clip_variant(_clip_rankmm))
VARIANTS["H"] = ("cl=clip16", _make_clip_variant(_clip_i16))
VARIANTS["B"] = ("cl=rk+i16", _make_clip_variant(_clip_i16_rankmm))

which = sys.argv[1] if len(sys.argv) > 1 else "fncrsg"
for k in which:
    name, fn = VARIANTS[k]
    if k in "CRHB":
        t0 = time.perf_counter()
        fn = fn()  # builds + compiles under the monkeypatch
        print(f"{name}: build+compile {time.perf_counter()-t0:.1f} s", flush=True)
    t0 = time.perf_counter()
    float(fn().sum())
    print(f"{name}: warm+compile {time.perf_counter()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn().sum())
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)
