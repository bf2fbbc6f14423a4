"""The fused anomaly-scoring graph — `compute_anomaly_scores` TPU-native.

Reference: improved_detection.py:117-153.  The reference runs five separate
library calls per batch (autoencoder.predict, encoder.predict,
scaler.transform, pca.transform, 2x SVM predict/decision); here the whole
chain — CAE forward, per-cell MSE/MAE, encoder features, RobustScaler, PCA
matmul, both RBF-SVM decision functions, 2D-FFT spectral features, and the
ensemble vote — is ONE jitted graph.  XLA fuses the elementwise stages into
the matmuls and the batch dimension shards over the 'data' mesh axis for
multi-chip screening with psum-reduced rates.

Output conventions match the reference exactly:
- `*_predictions` in {+1, -1} with -1 = anomaly;
- `*_scores` = negated SVM decision_function, higher = more anomalous
  (improved_detection.py:149-150);
- `*_anomaly_rate` = fraction(pred == -1) (improved_detection.py:151-152).
"""

from __future__ import annotations

import warnings

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.utils import prec

from cell_image_analysis_tpu.models.cae import CAE
from cell_image_analysis_tpu.models.svm import SVMParams, decision_function
from cell_image_analysis_tpu.ops.extract import (
    extract_candidates,
    extract_candidates_from_mask,
)
from cell_image_analysis_tpu.ops.fft_features import fft_features


class ScoringParams(NamedTuple):
    """Everything screening needs, as one jit-friendly pytree (built from the
    artifact store's six-file contract)."""

    cae_variables: dict          # {'params', 'batch_stats'}
    scaler_center: jax.Array     # (2048,)
    scaler_scale: jax.Array      # (2048,)
    pca_mean: jax.Array          # (2048,)
    pca_components: jax.Array    # (K, 2048)
    svm_conservative: SVMParams
    svm_moderate: SVMParams
    ensemble_mse_threshold: jax.Array  # ()
    # FFT spectral-feature detector (the README-promised "FFT analysis"
    # capability as a first-class scorer): RobustScaler stats + one-class SVM
    # over ops/fft_features vectors
    fft_scaler_center: jax.Array  # (F,)
    fft_scaler_scale: jax.Array   # (F,)
    svm_fft: SVMParams


class CellScores(NamedTuple):
    reconstruction_mse: jax.Array        # (B,)
    reconstruction_mae: jax.Array        # (B,)
    conservative_predictions: jax.Array  # (B,) int32 {+1,-1}
    moderate_predictions: jax.Array
    conservative_scores: jax.Array       # (B,) negated decision fn
    moderate_scores: jax.Array
    ensemble_predictions: jax.Array      # (B,) int32 {+1,-1}
    fft_predictions: jax.Array           # (B,) int32 {+1,-1}
    fft_scores: jax.Array                # (B,) negated decision fn
    fft: jax.Array                       # (B, F)


@partial(jax.jit, static_argnames=("model", "min_votes"))
def score_cells(model: CAE, params: ScoringParams, X: jax.Array, min_votes: int = 2) -> CellScores:
    """Score a (B, 64, 64, 1) batch of preprocessed cells."""
    X = X.astype(jnp.float32)
    recon, encoded = model.apply(params.cae_variables, X, train=False)
    diff = X - recon
    mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    mae = jnp.mean(jnp.abs(diff), axis=(1, 2, 3))

    feats = encoded.reshape(encoded.shape[0], -1)
    scaled = (feats - params.scaler_center) / params.scaler_scale
    reduced = jnp.dot(
        scaled - params.pca_mean,
        params.pca_components.T,
        preferred_element_type=jnp.float32,
        precision=prec.highest("scoring"),
    )

    d_cons = decision_function(params.svm_conservative, reduced)
    d_mod = decision_function(params.svm_moderate, reduced)
    p_cons = jnp.where(d_cons > 0, 1, -1).astype(jnp.int32)
    p_mod = jnp.where(d_mod > 0, 1, -1).astype(jnp.int32)

    votes = (
        (mse > params.ensemble_mse_threshold).astype(jnp.int32)
        + (p_cons == -1).astype(jnp.int32)
        + (p_mod == -1).astype(jnp.int32)
    )
    p_ens = jnp.where(votes >= min_votes, -1, 1).astype(jnp.int32)

    fft = fft_features(X)
    fft_scaled = (fft - params.fft_scaler_center) / params.fft_scaler_scale
    d_fft = decision_function(params.svm_fft, fft_scaled)
    p_fft = jnp.where(d_fft > 0, 1, -1).astype(jnp.int32)

    return CellScores(
        reconstruction_mse=mse,
        reconstruction_mae=mae,
        conservative_predictions=p_cons,
        moderate_predictions=p_mod,
        conservative_scores=-d_cons,
        moderate_scores=-d_mod,
        ensemble_predictions=p_ens,
        fft_predictions=p_fft,
        fft_scores=-d_fft,
        fft=fft,
    )


def score_frames(
    model: CAE,
    params: ScoringParams,
    segs: jax.Array,
    greens: jax.Array,
    segment_fn,
    chunk: int = 128,
    small_cap: int = 96,
    min_votes: int = 2,
    out_size: int = 64,
    clip_limit: float = 0.02,
    mesh=None,
    fallback_segment_fn=None,
    **candidate_kwargs,
) -> dict:
    """Device-resident screening of a (B, H, W) frame stack: vmapped
    segmentation + candidates, then fused gather+CLAHE+resize+scoring per
    packed chunk.  Bulk tensors never reach the host — only per-cell stats
    and score vectors do (two consolidated fetches + KBs per chunk), which is
    what the throughput of remote-attached chips is bound by.

    With a `mesh`, the frame batch shards over the 'data' axis (frames are
    i.i.d. — the SURVEY.md section 2.4 workhorse strategy) and parameters
    replicate; XLA inserts the collectives.  B should be a multiple of the
    mesh size.

    `fallback_segment_fn`: exact label-map segmentation to re-run with when
    a mask-returning segment_fn overflows the run-table capacity (never
    observed on realistic plates — see ops/runs.py).

    Returns the compute_anomaly_scores dict schema plus per-cell stats and
    frame_index."""
    from cell_image_analysis_tpu.ops.extract import preprocess_gather_score

    segs0, greens0 = segs, greens
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        segs = jax.device_put(segs, NamedSharding(mesh, P("data", None, None)))
        greens = jax.device_put(greens, NamedSharding(mesh, P("data", None, None)))
        params = jax.device_put(params, NamedSharding(mesh, P()))

    ckw = tuple(sorted(candidate_kwargs.items()))
    crops, heights, widths, packed_stats = _stage_a_graph(segs, greens, segment_fn, ckw)
    B, cap = crops.shape[0], crops.shape[1]
    crops = crops.reshape(B * cap, *crops.shape[2:])
    heights = heights.reshape(-1)
    widths = widths.reshape(-1)
    st = np.asarray(packed_stats)  # (B, 9, cap) — ONE transfer
    if st[:, 8].max() > 0.5:
        if fallback_segment_fn is not None:
            # run-table overflow: results untrustworthy, redo exactly
            return score_frames(
                model, params, segs0, greens0, fallback_segment_fn, chunk=chunk,
                small_cap=small_cap, min_votes=min_votes, out_size=out_size,
                clip_limit=clip_limit, mesh=mesh, **candidate_kwargs,
            )
        warnings.warn(
            "score_frames: run-table capacity overflow with no "
            "fallback_segment_fn — candidate extraction may have dropped or "
            "corrupted cells; pass fallback_segment_fn or raise the bound "
            "capacity (rcap; for the StarDist backend also max_candidates, "
            "which must scale with frame area — see "
            "InstanceDetails.cand_overflow)",
            RuntimeWarning,
            stacklevel=2,
        )
    valid = st[:, 0].reshape(-1) > 0.5
    hs = st[:, 1].reshape(-1).astype(np.int32)
    ws = st[:, 2].reshape(-1).astype(np.int32)

    pool = np.flatnonzero(valid)
    n = len(pool)
    stats = dict(
        label_ids=st[:, 3].reshape(-1).astype(np.int32)[pool],
        area=st[:, 4].reshape(-1).astype(np.int32)[pool],
        eccentricity=st[:, 5].reshape(-1)[pool],
        mean_intensity=st[:, 6].reshape(-1)[pool],
        std_intensity=st[:, 7].reshape(-1)[pool],
        frame_index=pool // cap,
    )
    if n == 0:
        return {}, stats

    fft_dim = 16 + 8 + 3
    packed = np.empty((n, 9 + fft_dim), np.float32)
    small = np.flatnonzero((hs[pool] <= small_cap) & (ws[pool] <= small_cap))
    large = np.flatnonzero((hs[pool] > small_cap) | (ws[pool] > small_cap))
    full_cap = crops.shape[-1]
    pending = []
    for bucket, cap_b in ((small, small_cap), (large, full_cap)):
        for start in range(0, len(bucket), chunk):
            take = bucket[start : start + chunk]
            idx = np.full(chunk, pool[take[0]], np.int32)
            idx[: len(take)] = pool[take]
            s = preprocess_gather_score(
                model, params, crops, heights, widths, jnp.asarray(idx), cap_b,
                out_size=out_size, clip_limit=clip_limit, min_votes=min_votes,
            )
            pending.append((take, s))  # async dispatch; fetch after all queue
    for take, s in pending:
        packed[take] = np.asarray(s)[: len(take)]  # ONE fetch per chunk

    out = {
        "reconstruction_mse": packed[:, 0],
        "reconstruction_mae": packed[:, 1],
        "conservative_predictions": packed[:, 2].astype(np.int32),
        "moderate_predictions": packed[:, 3].astype(np.int32),
        "conservative_scores": packed[:, 4],
        "moderate_scores": packed[:, 5],
        "ensemble_predictions": packed[:, 6].astype(np.int32),
        "fft_predictions": packed[:, 7].astype(np.int32),
        "fft_scores": packed[:, 8],
        "fft_features": packed[:, 9:],
    }
    for name in ("conservative", "moderate", "ensemble", "fft"):
        out[f"{name}_anomaly_rate"] = float(np.mean(out[f"{name}_predictions"] == -1))
    return out, stats


_FUSED_FFT_DIM = 16 + 8 + 3
_FUSED_D = 9 + _FUSED_FFT_DIM


def _stage_a_one(segment_fn, candidate_kwargs, seg, green):
    """Segmentation + stage-A candidates for ONE frame (traced under vmap).

    A segment_fn with `returns_mask = True` produces a boolean foreground
    mask instead of a label map; it routes through the run-length CC +
    regionprops path (ops/runs.py — measured 88 vs 259 ms per 8-frame batch
    on the production TPU) and contributes a per-frame run-capacity overflow
    flag, broadcast into row 8 of the packed stats so the host can trigger
    the exact label-map fallback.  Label-map segment_fns pack zeros there.

    A segment_fn with `returns_overflow = True` (the StarDist backend)
    returns (labels, seg_overflow); its flag — e.g. the tiled rasterizer's
    per-tile m_cap drop — ORs into row 8 so the same host fallback fires."""
    kw = dict(candidate_kwargs)

    def segment(seg):
        if getattr(segment_fn, "returns_overflow", False):
            return segment_fn(seg)
        return segment_fn(seg), None

    if getattr(segment_fn, "returns_mask", False):
        kw.pop("fg_fraction", None)
        mask, seg_ovf = segment(seg)
        cand, overflow = extract_candidates_from_mask(mask, green, **kw)
        if seg_ovf is not None:
            overflow = overflow | seg_ovf
        ovf = jnp.full(cand.valid.shape, overflow, jnp.float32)
    elif getattr(segment_fn, "runs_props", False):
        # label map whose stats run through the run-length regionprops
        # (no CC, no fg compaction) — the StarDist backend's fast stage A;
        # overflow routes to the exact pixel path like the mask path
        from cell_image_analysis_tpu.ops.extract import (
            extract_candidates_from_labels_runs,
        )

        kw.pop("fg_fraction", None)
        kw.pop("connectivity", None)
        labels, seg_ovf = segment(seg)
        cand, overflow = extract_candidates_from_labels_runs(labels, green, **kw)
        if seg_ovf is not None:
            overflow = overflow | seg_ovf
        ovf = jnp.full(cand.valid.shape, overflow, jnp.float32)
    else:
        kw.pop("rcap", None)
        kw.pop("connectivity", None)
        labels, seg_ovf = segment(seg)
        cand = extract_candidates(labels, green, **kw)
        ovf = (jnp.zeros(cand.valid.shape, jnp.float32) if seg_ovf is None
               else jnp.full(cand.valid.shape, seg_ovf, jnp.float32))
    packed = jnp.stack([
        cand.valid.astype(jnp.float32), cand.heights.astype(jnp.float32),
        cand.widths.astype(jnp.float32), cand.label_ids.astype(jnp.float32),
        cand.area.astype(jnp.float32), cand.eccentricity,
        cand.mean_intensity, cand.std_intensity, ovf,
    ])
    return cand.crops, cand.heights, cand.widths, packed


_N_STAT_ROWS = 9  # valid,h,w,label,area,ecc,mean,std,overflow


@partial(jax.jit, static_argnames=("segment_fn", "ckw"))
def _stage_a_graph(segs, greens, segment_fn, ckw):
    """Vmapped segmentation + candidate extraction for a frame batch.

    Module-level jit: defining this inline per score_frames call would
    re-trace (and re-fetch the remote compile of) the whole segmentation
    graph every batch.  Caching keys on `segment_fn` identity — callers must
    pass a stable callable."""
    candidate_kwargs = dict(ckw)

    def one(seg, green):
        return _stage_a_one(segment_fn, candidate_kwargs, seg, green)

    return jax.vmap(one)(segs, greens)


def _fused_screen_local(model, params, segs, greens, segment_fn, chunk,
                        caps, min_votes, out_size, clip_limit, ckw,
                        vary_axis=None):
    """The whole-batch screening program body (see score_frames_fused) —
    pure traced function; jitted once at module level (single device) or
    wrapped per-shard in shard_map (mesh).  The inner control flow (bucket
    compaction, dynamic-bound chunk loops) only touches the local frame
    shard, so the mesh path needs zero cross-chip communication.
    `vary_axis`: under shard_map, the mesh axis name — loop-carry literals
    (the zeros result buffer) must be marked device-varying with pvary to
    type-match the body outputs."""
    from cell_image_analysis_tpu.ops.clahe import clahe_cells
    from cell_image_analysis_tpu.ops.resize import resize_cells

    candidate_kwargs = dict(ckw)

    def one(seg, green):
        return _stage_a_one(segment_fn, candidate_kwargs, seg, green)

    crops, heights, widths, packed_stats = jax.vmap(one)(segs, greens)
    B = crops.shape[0]
    N = B * crops.shape[1]
    full_cap = crops.shape[-1]
    crops = crops.reshape(N, full_cap, full_cap)
    heights = heights.reshape(-1)
    widths = widths.reshape(-1)
    valid = packed_stats[:, 0].reshape(-1) > 0.5

    # size buckets: CLAHE/resize cost scales with the padded cap^2, so each
    # cell runs at the tightest capacity that fits it (numerics-neutral —
    # the kernels mask by actual h/w).  Each cap additionally splits by
    # min side: cells with min(h, w) >= 16 have a CLAHE tile grid ns <= 12
    # (ops/clahe.NS_CAP_16PX), shrinking the clip state and interpolation
    # matrices ~1.8x; the rare thin cells route through the full 16-tile
    # capacity.  Also numerics-neutral (capacity only pads layout).
    from cell_image_analysis_tpu.ops.clahe import NS_CAP, NS_CAP_16PX

    all_caps = tuple(c for c in sorted(caps) if c < full_cap) + (full_cap,)
    pad_len = (-(-N // chunk)) * chunk

    def bucket(mask):
        idx = jnp.nonzero(mask, size=N, fill_value=N)[0]
        idx = jnp.pad(idx, (0, pad_len - N), constant_values=N)
        return idx, jnp.sum(mask.astype(jnp.int32))

    # ns <= 12 per axis iff side >= 16 (k >= 2) or side <= 12 (k = 1);
    # sides 13-15 give ns = 13-15.  Cells with such a side are rare, so
    # they ride the final full-capacity bucket (NS_CAP=16) instead of
    # doubling the bucket count (a split-per-cap variant measured slower:
    # more loop bodies + tail padding).
    ns_ok = ((heights >= 16) | (heights <= 12)) & ((widths >= 16) | (widths <= 12))
    buckets = []
    fits_prev = jnp.zeros_like(valid)
    for cap_b in all_caps[:-1]:
        fits = (heights <= cap_b) & (widths <= cap_b) & ns_ok
        buckets.append(bucket(valid & fits & ~fits_prev) + (cap_b, NS_CAP_16PX))
        fits_prev = fits
    buckets.append(bucket(valid & ~fits_prev) + (all_caps[-1], NS_CAP))

    out = jnp.zeros((N + 1, _FUSED_D), jnp.float32)  # row N = scrap for tails
    if vary_axis is not None:
        out = jax.lax.pvary(out, vary_axis)

    def run_bucket(out, idx_arr, n, cap_b, ns_cap):
        def body(i, out):
            ids = jax.lax.dynamic_slice(idx_arr, (i * chunk,), (chunk,))
            ids_c = jnp.minimum(ids, N - 1)
            c = crops[ids_c][:, :cap_b, :cap_b]
            h = heights[ids_c]
            w = widths[ids_c]
            eq = clahe_cells(c, h, w, clip_limit=clip_limit, ns_cap=ns_cap)
            cells = resize_cells(eq, h, w, out_size=out_size)
            s = score_cells(model, params, cells[..., None], min_votes=min_votes)
            row = jnp.concatenate(
                [
                    s.reconstruction_mse[:, None], s.reconstruction_mae[:, None],
                    s.conservative_predictions[:, None].astype(jnp.float32),
                    s.moderate_predictions[:, None].astype(jnp.float32),
                    s.conservative_scores[:, None], s.moderate_scores[:, None],
                    s.ensemble_predictions[:, None].astype(jnp.float32),
                    s.fft_predictions[:, None].astype(jnp.float32),
                    s.fft_scores[:, None],
                    s.fft,
                ],
                axis=1,
            )
            return out.at[ids].set(row)

        return jax.lax.fori_loop(0, (n + chunk - 1) // chunk, body, out)

    for idx_arr, n, cap_b, ns_cap in buckets:
        out = run_bucket(out, idx_arr, n, cap_b, ns_cap)
    # one flat buffer so the host needs a single fetch for everything
    return jnp.concatenate([out.reshape(-1), packed_stats.reshape(-1)])


@partial(
    jax.jit,
    static_argnames=("model", "segment_fn", "chunk", "caps", "min_votes",
                     "out_size", "clip_limit", "ckw"),
)
def _fused_screen_graph(model, params, segs, greens, segment_fn, chunk,
                        caps, min_votes, out_size, clip_limit, ckw):
    """Single-device jit of the fused screening body.  MUST stay a
    module-level jit: an inner `@jax.jit def graph` would be a fresh function
    object per call, re-tracing and re-fetching the multi-second remote
    compile every batch (measured 7.0s vs 2.9s per batch)."""
    return _fused_screen_local(model, params, segs, greens, segment_fn, chunk,
                               caps, min_votes, out_size, clip_limit, ckw)


@partial(
    jax.jit,
    static_argnames=("model", "segment_fn", "chunk", "caps", "min_votes",
                     "out_size", "clip_limit", "ckw", "mesh"),
)
def _fused_screen_graph_mesh(model, params, segs, greens, segment_fn, chunk,
                             caps, min_votes, out_size, clip_limit, ckw, mesh):
    """Mesh-sharded fused screening: frames shard over the 'data' axis
    (SURVEY.md section 2.4 workhorse strategy), parameters replicate, and
    every device runs the complete fused body — stage A, bucket compaction,
    dynamic chunk loops — on its local shard with NO collectives (frames are
    i.i.d.; rates are computed host-side from the gathered per-cell rows
    exactly as in the single-device path, so sharded == unsharded
    bit-for-bit).  Output: (n_devices, per_shard_flat)."""
    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    def local(params, segs, greens):
        flat = _fused_screen_local(model, params, segs, greens, segment_fn,
                                   chunk, caps, min_votes, out_size,
                                   clip_limit, ckw, vary_axis="data")
        return flat[None]  # add shard axis for out_specs P('data')

    return shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("data", None, None), P("data", None, None)),
        out_specs=P("data", None),
    )(params, segs, greens)


def score_frames_fused(
    model: CAE,
    params: ScoringParams,
    segs: jax.Array,
    greens: jax.Array,
    segment_fn,
    chunk: int = 256,
    caps: tuple = (64, 96),
    min_votes: int = 2,
    out_size: int = 64,
    clip_limit: float = 0.02,
    mesh=None,
    fallback_segment_fn=None,
    **candidate_kwargs,
) -> dict:
    """Single-dispatch variant of `score_frames`: the WHOLE per-batch
    screening graph — vmapped segmentation + candidates, device-side bucket
    partition, and a `lax.fori_loop` with a *data-dependent* trip count over
    the fused gather+CLAHE+resize+score chunks — is ONE jitted call, and the
    host does ONE consolidated fetch.

    Rationale: on remote-attached chips each dispatch/fetch costs ~30 ms and
    the chunked `score_frames` pays (2 + n_chunks) round trips per batch.
    Here the chunk loop's dynamic bound (ceil(n_bucket/chunk)) lives on
    device, so XLA runs only the needed chunks while shapes stay static;
    tail slots scatter into a scrap row.  Loop mechanics measured free
    (scripts/probe_fused_variants.py: 34 ms floor) and the fused loop beats
    the separate chunk dispatches (362 vs 437 ms on the bench workload).

    NOTE: jit caching keys on `segment_fn` identity — pass a stable callable
    (module function / functools.partial held by the caller), NOT a fresh
    lambda per call, or every batch re-traces.

    With a `mesh`, the frame batch shards over the 'data' axis and each
    device runs the complete fused body on its shard (shard_map, zero
    collectives); results are bit-identical to the single-device path.
    B must be a multiple of the mesh size.

    Numerically identical to `score_frames` (same kernels, same order)."""
    return score_frames_fused_wait(score_frames_fused_start(
        model, params, segs, greens, segment_fn, chunk=chunk, caps=caps,
        min_votes=min_votes, out_size=out_size, clip_limit=clip_limit,
        mesh=mesh, fallback_segment_fn=fallback_segment_fn,
        **candidate_kwargs,
    ))


def score_frames_fused_start(
    model: CAE,
    params: ScoringParams,
    segs: jax.Array,
    greens: jax.Array,
    segment_fn,
    chunk: int = 256,
    caps: tuple = (64, 96),
    min_votes: int = 2,
    out_size: int = 64,
    clip_limit: float = 0.02,
    mesh=None,
    fallback_segment_fn=None,
    **candidate_kwargs,
) -> dict:
    """Dispatch half of `score_frames_fused`: enqueues the fused batch graph
    (JAX dispatch is asynchronous, so the device starts immediately) and
    returns a pending handle WITHOUT fetching.  Pass the handle to
    `score_frames_fused_wait` to fetch + decode.  A caller screening many
    batches can overlap batch k's ~35 ms host fetch with batch k+1's device
    compute by starting k+1 before waiting on k (utils/bench.py,
    pipeline/screening.py)."""
    ckw = tuple(sorted(candidate_kwargs.items()))
    B = int(segs.shape[0])
    pend = dict(
        model=model, params=params, segs0=segs, greens0=greens,
        segment_fn=segment_fn, chunk=chunk, caps=caps, min_votes=min_votes,
        out_size=out_size, clip_limit=clip_limit, mesh=mesh,
        fallback_segment_fn=fallback_segment_fn,
        candidate_kwargs=candidate_kwargs,
    )
    if mesh is None:
        pend["flat_dev"] = _fused_screen_graph(
            model, params, segs, greens, segment_fn, chunk, tuple(caps),
            min_votes, out_size, clip_limit, ckw,
        )  # ONE dispatch; the fetch happens in _wait
        pend["b_local"] = B
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        nd = mesh.shape["data"]
        if B % nd:
            # pad to a multiple of the mesh with zero frames — they produce
            # no QC-passing cells (intensity gates fail on zeros), so the
            # decoded pool is unaffected
            pad = nd - B % nd
            zshape = (pad,) + tuple(segs.shape[1:])
            segs = jnp.concatenate([segs, jnp.zeros(zshape, segs.dtype)])
            greens = jnp.concatenate([greens, jnp.zeros(zshape, greens.dtype)])
            B += pad
        segs = jax.device_put(segs, NamedSharding(mesh, P("data", None, None)))
        greens = jax.device_put(greens, NamedSharding(mesh, P("data", None, None)))
        params = jax.device_put(params, NamedSharding(mesh, P()))
        pend["flat_dev"] = _fused_screen_graph_mesh(
            model, params, segs, greens, segment_fn, chunk, tuple(caps),
            min_votes, out_size, clip_limit, ckw, mesh,
        )  # (nd, per_shard); still ONE dispatch
        pend["b_local"] = B // nd
    return pend


def score_frames_fused_wait(pend: dict) -> tuple:
    """Fetch + decode half of `score_frames_fused` (ONE consolidated host
    fetch per batch; run-table-overflow fallback re-runs synchronously)."""
    D = _FUSED_D
    candidate_kwargs = pend["candidate_kwargs"]
    ccap = candidate_kwargs.get("cell_capacity", 512)
    b_local = pend["b_local"]
    model, params = pend["model"], pend["params"]
    segs0, greens0 = pend["segs0"], pend["greens0"]
    fallback_segment_fn = pend["fallback_segment_fn"]
    mesh = pend["mesh"]

    fetched = np.asarray(pend["flat_dev"])  # ONE fetch
    if mesh is None:
        shards = [(fetched, 0)]
    else:
        shards = [(fetched[s], s * b_local) for s in range(fetched.shape[0])]

    n_local = b_local * ccap
    if any(
        flat[(n_local + 1) * D :].reshape(b_local, _N_STAT_ROWS, ccap)[:, 8].max() > 0.5
        for flat, _ in shards
    ):
        if fallback_segment_fn is not None:
            # run-table overflow in the mask path: redo with the exact label path
            return score_frames_fused(
                model, params, segs0, greens0, fallback_segment_fn,
                chunk=pend["chunk"], caps=pend["caps"],
                min_votes=pend["min_votes"], out_size=pend["out_size"],
                clip_limit=pend["clip_limit"], mesh=mesh, **candidate_kwargs,
            )
        warnings.warn(
            "score_frames_fused: run-table capacity overflow with no "
            "fallback_segment_fn — candidate extraction may have dropped or "
            "corrupted cells; pass fallback_segment_fn or raise the bound "
            "capacity (rcap; for the StarDist backend also max_candidates, "
            "which must scale with frame area — see "
            "InstanceDetails.cand_overflow)",
            RuntimeWarning,
            stacklevel=2,
        )
    rows_parts, stat_parts = [], []
    for flat, frame0 in shards:
        rows = flat[: (n_local + 1) * D].reshape(n_local + 1, D)
        st = flat[(n_local + 1) * D :].reshape(b_local, _N_STAT_ROWS, ccap)
        valid = st[:, 0].reshape(-1) > 0.5
        pool = np.flatnonzero(valid)
        stat_parts.append(dict(
            label_ids=st[:, 3].reshape(-1).astype(np.int32)[pool],
            area=st[:, 4].reshape(-1).astype(np.int32)[pool],
            eccentricity=st[:, 5].reshape(-1)[pool],
            mean_intensity=st[:, 6].reshape(-1)[pool],
            std_intensity=st[:, 7].reshape(-1)[pool],
            frame_index=frame0 + pool // ccap,
        ))
        rows_parts.append(rows[pool])

    stats = {k: np.concatenate([p[k] for p in stat_parts]) for k in stat_parts[0]}
    packed = np.concatenate(rows_parts, axis=0)
    if packed.shape[0] == 0:
        return {}, stats

    out = {
        "reconstruction_mse": packed[:, 0],
        "reconstruction_mae": packed[:, 1],
        "conservative_predictions": packed[:, 2].astype(np.int32),
        "moderate_predictions": packed[:, 3].astype(np.int32),
        "conservative_scores": packed[:, 4],
        "moderate_scores": packed[:, 5],
        "ensemble_predictions": packed[:, 6].astype(np.int32),
        "fft_predictions": packed[:, 7].astype(np.int32),
        "fft_scores": packed[:, 8],
        "fft_features": packed[:, 9:],
    }
    for name in ("conservative", "moderate", "ensemble", "fft"):
        out[f"{name}_anomaly_rate"] = float(np.mean(out[f"{name}_predictions"] == -1))
    return out, stats


def compute_anomaly_scores(model: CAE, params: ScoringParams, cells, valid=None,
                           min_votes: int = 2) -> dict:
    """Host-facing wrapper with the reference's dict schema
    (improved_detection.py:144-153), plus ensemble + FFT extensions.

    `valid` optionally masks capacity padding; rates are computed over valid
    entries only."""
    X = jnp.asarray(np.asarray(cells, dtype=np.float32))
    if X.ndim == 3:
        X = X[..., None]
    if X.shape[0] == 0:
        return {}
    s = score_cells(model, params, X, min_votes=min_votes)
    if valid is None:
        v = np.ones(X.shape[0], bool)
    else:
        v = np.asarray(valid, bool)
    n = max(int(v.sum()), 1)

    def rate(pred):
        return float(np.sum((np.asarray(pred) == -1) & v) / n)

    out = {
        "reconstruction_mse": np.asarray(s.reconstruction_mse)[v],
        "reconstruction_mae": np.asarray(s.reconstruction_mae)[v],
        "conservative_predictions": np.asarray(s.conservative_predictions)[v],
        "moderate_predictions": np.asarray(s.moderate_predictions)[v],
        "conservative_scores": np.asarray(s.conservative_scores)[v],
        "moderate_scores": np.asarray(s.moderate_scores)[v],
        "ensemble_predictions": np.asarray(s.ensemble_predictions)[v],
        "fft_predictions": np.asarray(s.fft_predictions)[v],
        "fft_scores": np.asarray(s.fft_scores)[v],
        "fft_features": np.asarray(s.fft)[v],
        "conservative_anomaly_rate": rate(s.conservative_predictions),
        "moderate_anomaly_rate": rate(s.moderate_predictions),
        "ensemble_anomaly_rate": rate(s.ensemble_predictions),
        "fft_anomaly_rate": rate(s.fft_predictions),
    }
    return out
