"""Benchmark rig: end-to-end screening throughput (cells/sec/chip).

BASELINE.md: the reference publishes no numbers, so the CPU reference
throughput is measured by this project (first build milestone) using the
numpy/scipy/sklearn *oracle* implementations of the same algorithms — the
same libraries the reference delegates to — over identical synthetic frames.
The measured value is cached in CPU_BASELINE.json (committed) so `bench.py`
reports a stable vs_baseline ratio on TPU.

Benchmarked path (per frame): percentile normalize -> segmentation
(threshold backend: threshold + connected components) -> regionprops + QC ->
crop gather -> CLAHE -> anti-aliased 64x64 resize -> CAE forward ->
encoder -> RobustScaler -> PCA -> 2x RBF-SVM decisions -> ensemble + FFT.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
_BASELINE_PATH = os.path.join(_REPO_ROOT, "CPU_BASELINE.json")
_BASELINE_STARDIST_PATH = os.path.join(_REPO_ROOT, "CPU_BASELINE_STARDIST.json")
_UNET_WEIGHTS_PATH = os.path.join(_REPO_ROOT, "assets", "unet_synthetic.pkl")


def _make_frames(n_frames: int, size: int, n_cells: int, seed: int = 7):
    from cell_image_analysis_tpu.utils.synthetic import (
        make_frame,
        make_frame_instances,
    )

    rng = np.random.default_rng(seed)
    if size >= 2048:
        # windowed renderer: same cell/noise distribution (clustering=0), but
        # O(n_cells * r^2) — plate-scale generation in seconds instead of
        # ~2 min/frame (the truncated exp tails are ~1e-10 of amp, far below
        # the uint16 quantization step)
        return [make_frame_instances(rng, size=size, n_cells=n_cells)[0]
                for _ in range(n_frames)]
    frames = [make_frame(rng, size=size, n_cells=n_cells) for _ in range(n_frames)]
    return frames


def _fit_params(seed: int = 0, X: np.ndarray | None = None):
    """Quick artifact fit on synthetic cells (not part of the timed path).

    X: optional (N, 64, 64, 1) float32 training cells; default is the
    make_cells generator.  utils/parity passes pipeline-extracted cells so
    parity test frames score near nu (borderline-rich workloads)."""
    import jax
    import jax.numpy as jnp

    from cell_image_analysis_tpu.models.cae import encode, init_cae, reconstruction_errors
    from cell_image_analysis_tpu.models.ensemble import EnsembleDetector
    from cell_image_analysis_tpu.models.pca import PCA
    from cell_image_analysis_tpu.models.scaler import RobustScaler
    from cell_image_analysis_tpu.models.svm import OneClassSVM
    from cell_image_analysis_tpu.utils.synthetic import make_cells

    rng = np.random.default_rng(seed)
    model, variables = init_cae(jax.random.PRNGKey(seed))
    if X is None:
        X = make_cells(rng, 256)[..., None]
    feats = np.asarray(encode(model, variables, jnp.asarray(X)))
    scaler = RobustScaler().fit(feats)
    pca = PCA(n_components=64).fit(np.asarray(scaler.transform(feats)))
    reduced = np.asarray(pca.transform(np.asarray(scaler.transform(feats))))
    cons = OneClassSVM(nu=0.05).fit(reduced)
    mod = OneClassSVM(nu=0.10).fit(reduced)
    mse, _ = reconstruction_errors(model, variables, jnp.asarray(X))
    ens = EnsembleDetector.fit(np.asarray(mse))
    from cell_image_analysis_tpu.io.artifacts import build_scoring_params
    from cell_image_analysis_tpu.ops.fft_features import fft_features

    fft = np.asarray(fft_features(jnp.asarray(X)))
    fft_scaler = RobustScaler().fit(fft)
    fft_det = OneClassSVM(nu=0.10).fit(np.asarray(fft_scaler.transform(fft)))
    params = build_scoring_params(
        model, variables, scaler, pca,
        {"Conservative": cons, "Moderate": mod, "FFT": fft_det, "FFT_scaler": fft_scaler},
        ens,
    )
    host = dict(model=model, variables=variables, scaler=scaler, pca=pca,
                cons=cons, mod=mod, ens=ens,
                fft_scaler=fft_scaler, fft_det=fft_det)
    return model, params, host


def _threshold_mask_fn(s):
    """Identity-stable mask-returning segment_fn (the scoring graphs jit-cache
    on segment_fn identity): the production threshold backend stops at the
    boolean mask and stage A runs through the run-length CC/regionprops."""
    from cell_image_analysis_tpu.models.segmentation import threshold_mask

    return threshold_mask(s)


_threshold_mask_fn.returns_mask = True


def load_synthetic_unet_variables(path: str | None = None) -> dict:
    """Committed in-framework-trained U-Net weights for the StarDist backend
    (scripts/make_unet_weights.py — the no-network stand-in for the
    reference's downloaded `2D_versatile_fluo`).  Raises ValueError when the
    file is not a make_unet_weights artifact (callers may then fall back to
    the generic pytree loader, io/artifacts.load_cae)."""
    import pickle

    import jax.numpy as jnp
    import jax

    path = path or _UNET_WEIGHTS_PATH
    with open(path, "rb") as f:
        payload = pickle.load(f)
    magic = payload.get("magic", "") if isinstance(payload, dict) else ""
    if magic != "cell_image_analysis_tpu/unet-synthetic-v1":
        raise ValueError(f"{path}: unexpected payload")
    return {"params": jax.tree.map(jnp.asarray, payload["params"])}


_STARDIST_BACKENDS: dict = {}


def stardist_backend(max_candidates: int = 256, raster_patch: int = 96,
                     prob_thresh: float | None = None, raster_cap: int = 128,
                     runs_props: bool = True, unet_dtype: str = "float32",
                     raster_mode: str | None = None, raster_tile: int | None = None,
                     raster_m_cap: int | None = None,
                     unet_precision: str | None = None,
                     unet_winograd: str | None = None,
                     unet_hilo: str | None = None,
                     unet_wb16: str | None = None,
                     nms_max_pairs: int | None = None):
    """Identity-stable StarDistBackend over the committed synthetic weights
    (the scoring graphs jit-cache on segment_fn identity)."""
    from cell_image_analysis_tpu.config import SegConfig
    from cell_image_analysis_tpu.models.segmentation import StarDistBackend

    kw = {} if prob_thresh is None else {"prob_thresh": prob_thresh}
    if raster_mode is None:
        raster_mode = os.environ.get("CIA_BENCH_SD_RMODE", SegConfig.raster_mode)
    if raster_tile is None:
        raster_tile = int(os.environ.get("CIA_BENCH_SD_TILE", SegConfig.raster_tile))
    if raster_m_cap is None:
        raster_m_cap = int(os.environ.get("CIA_BENCH_SD_MCAP", SegConfig.raster_m_cap))
    if unet_precision is None:
        unet_precision = os.environ.get("CIA_BENCH_SD_PREC", SegConfig.unet_precision)
    if unet_winograd is None:
        unet_winograd = os.environ.get("CIA_BENCH_SD_WINO", SegConfig.unet_winograd)
    if unet_hilo is None:
        unet_hilo = os.environ.get("CIA_BENCH_SD_HILO", SegConfig.unet_hilo)
    if unet_wb16 is None:
        unet_wb16 = os.environ.get("CIA_BENCH_SD_WB16", SegConfig.unet_wb16)
    if nms_max_pairs is None:
        nms_max_pairs = int(os.environ.get("CIA_BENCH_SD_NMS_PAIRS",
                                           SegConfig.nms_max_pairs))
    lvl0_precision = os.environ.get("CIA_BENCH_SD_LVL0_PREC",
                                    SegConfig.unet_lvl0_precision)
    lvl0_s2d = os.environ.get(
        "CIA_BENCH_SD_LVL0_S2D", "1" if SegConfig.unet_lvl0_s2d else "0") == "1"
    kw.update(raster_mode=raster_mode, raster_tile=raster_tile,
              raster_m_cap=raster_m_cap, unet_precision=unet_precision,
              unet_lvl0_precision=lvl0_precision, unet_lvl0_s2d=lvl0_s2d,
              unet_winograd=unet_winograd, unet_hilo=unet_hilo,
              unet_wb16=unet_wb16, nms_max_pairs=nms_max_pairs)
    key = (max_candidates, raster_patch, prob_thresh, raster_cap, runs_props,
           unet_dtype, raster_mode, raster_tile, raster_m_cap, unet_precision,
           lvl0_precision, lvl0_s2d, unet_winograd, unet_hilo, unet_wb16,
           nms_max_pairs)
    if key not in _STARDIST_BACKENDS:
        cfg = SegConfig(max_candidates=max_candidates, raster_patch=raster_patch,
                        raster_cap=raster_cap, unet_dtype=unet_dtype, **kw)
        _STARDIST_BACKENDS[key] = StarDistBackend(
            load_synthetic_unet_variables(), cfg, runs_props=runs_props
        )
    return _STARDIST_BACKENDS[key]


def _batch_pipeline(model, params, frame_batch: int = 8, fused: bool = True,
                    backend: str = "threshold"):
    """The production path: device-resident frame screening — vmapped
    segmentation+candidates (run-length stage A with exact label-path
    fallback on run-table overflow), fused gather+CLAHE+resize+scoring
    chunks; with `fused` the whole batch is ONE dispatch + ONE fetch
    (score_frames_fused); otherwise the host-chunked score_frames path."""
    from cell_image_analysis_tpu.models.segmentation import threshold_segment
    from cell_image_analysis_tpu.pipeline.scoring import score_frames, score_frames_fused

    from cell_image_analysis_tpu.pipeline.scoring import (
        score_frames_fused_start,
        score_frames_fused_wait,
    )

    fn = score_frames_fused if fused else score_frames

    # chunk/caps tuned on-chip (BENCH.md): small chunks + tight size buckets
    # minimize padded-pixel work in the tail chunks of each bucket.
    # fg_fraction=0.12 is safe by construction for the threshold backend:
    # a 90th-percentile threshold bounds foreground at 10% and the opening
    # only shrinks it (it only gates the fallback label path's compaction).
    if fused:
        # env overrides for on-chip tuning sweeps (scripts/ probes)
        chunk = int(os.environ.get("CIA_BENCH_CHUNK", "32"))
        caps = tuple(int(c) for c in os.environ.get("CIA_BENCH_CAPS", "64,96").split(","))
        kw = dict(chunk=chunk, caps=caps)
    else:
        kw = dict(chunk=256)

    if backend == "stardist":
        # label-map path: StarDist predict_instances per frame; no run-table,
        # so no fallback/fg_fraction knobs
        # Capacity knobs SCALE WITH FRAME AREA (BENCH.md r4s3: the r2s8
        # 2048^2 row and the first 4096^2 run silently under-extracted —
        # max_candidates=256 top-K binds far below the planted density at
        # plate scale).  Env overrides for the plate-scale scripts.
        sd_kw = dict(
            max_candidates=int(os.environ.get("CIA_BENCH_SD_CAND", "256")),
            raster_patch=int(os.environ.get("CIA_BENCH_SD_PATCH", "96")),
            raster_cap=int(os.environ.get("CIA_BENCH_SD_RCAP", "128")),
            unet_dtype=os.environ.get("CIA_BENCH_SD_DTYPE", "float32"),
        )
        nms_pairs = os.environ.get("CIA_BENCH_SD_NMSPAIRS")
        if nms_pairs is not None:
            sd_kw["nms_max_pairs"] = int(nms_pairs)
        segment_fn = stardist_backend(**sd_kw)
        # exact twin: re-run target on run-table, tiled-raster (per-tile
        # m_cap), or NMS-pair-budget overflow — pixel-path stats, scatter
        # raster (no tile cap), exact K*K NMS pairs
        fb_kw = dict(sd_kw)
        fb_kw["nms_max_pairs"] = sd_kw["max_candidates"] ** 2
        fallback = stardist_backend(
            runs_props=False, raster_mode="scatter", **fb_kw)
        full_kw = dict(label_capacity=(segment_fn.cfg.raster_cap
                                       or segment_fn.cfg.max_candidates),
                       cell_capacity=int(os.environ.get(
                           "CIA_BENCH_SD_CCAP", "128")),
                       fallback_segment_fn=fallback,
                       # rcap=32 measured +8% over 64 (scripts/sweep_fb_rcap);
                       # overflow routes to the exact label path, so the knob
                       # is a speed-only choice
                       rcap=int(os.environ.get("CIA_BENCH_SD_RUNS_RCAP", "32")),
                       **kw)
    else:
        segment_fn = _threshold_mask_fn
        kw["fg_fraction"] = 0.12
        full_kw = dict(fallback_segment_fn=threshold_segment,
                       label_capacity=4096, cell_capacity=128, **kw)

    def run(segs, greens):
        scores, stats = fn(
            model, params, segs, greens, segment_fn, **full_kw,
        )
        return len(stats["area"]), scores

    def run_stream(batches):
        """Pipelined: dispatch every batch up front (async), fetch in order —
        batch k's ~35 ms host fetch overlaps batch k+1's device compute,
        exactly as pipeline/screening.py does in production."""
        pendings = [
            score_frames_fused_start(model, params, s, g, segment_fn,
                                     **full_kw)
            for s, g in batches
        ]
        total = 0
        for pend in pendings:
            scores, stats = score_frames_fused_wait(pend)
            total += len(stats["area"])
        return total

    return run, run_stream


def run_tpu_bench(n_frames: int = 8, size: int = 1024, n_cells: int = 80,
                  frame_batch: int = 8, fused: bool = True,
                  backend: str = "threshold") -> dict:
    import jax
    import jax.numpy as jnp

    model, params, _ = _fit_params()
    frames = _make_frames(n_frames, size, n_cells)
    run, run_stream = _batch_pipeline(model, params, frame_batch, fused=fused,
                                      backend=backend)

    stack = np.stack(frames)
    segs = jnp.asarray(stack[..., 2].astype(np.float32))
    greens = jnp.asarray(stack[..., 1].astype(np.float32))

    batches = [(segs[i : i + frame_batch], greens[i : i + frame_batch])
               for i in range(0, n_frames, frame_batch)]

    # warmup / compile every graph in the path (twice: the second pass hits
    # any bucket/chunk-count variants the first left cold)
    run(*batches[0])
    run(*batches[0])

    pipelined = fused and len(batches) > 1
    best = None
    for _ in range(2):  # best-of-2 damps tunnel-latency variance
        t0 = time.perf_counter()
        if pipelined:
            total = run_stream(batches)
        else:
            total = 0
            for s, g in batches:
                n, scores = run(s, g)
                total += n
        dt = time.perf_counter() - t0
        if best is None or total / dt > best["cells_per_sec"]:
            best = dict(cells=total, seconds=dt, cells_per_sec=total / dt,
                        frames_per_sec=n_frames / dt, n_frames=n_frames, size=size)
    return best


def _keras_unet_segment_cpu(size: int):
    """The reference's actual segmentation stack on CPU: TF/Keras U-Net
    forward (same weights as the TPU backend, via the Keras twin) + the
    numpy NMS/rasterization oracle of StarDist's C++ post-processing."""
    from cell_image_analysis_tpu.io.keras_interop import keras_unet_from_variables
    from cell_image_analysis_tpu.ops.oracle.stardist_np import predict_instances_np

    variables = load_synthetic_unet_variables()
    km = keras_unet_from_variables(variables, input_size=size)

    def segment(norm_seg: np.ndarray) -> np.ndarray:
        prob, dist = km.predict(
            norm_seg[None, :, :, None].astype(np.float32), verbose=0
        )
        labels, _ = predict_instances_np(
            np.asarray(prob)[0, :, :, 0], np.asarray(dist)[0],
            max_candidates=256,
        )
        return labels

    return segment


def run_cpu_reference(n_frames: int = 2, size: int = 1024, n_cells: int = 80,
                      backend: str = "threshold") -> dict:
    """The same pipeline with the CPU oracle implementations (numpy/scipy/
    sklearn; TF/Keras for the StarDist U-Net) — the measured stand-in for
    the reference's CPU stack."""
    from scipy import ndimage as ndi

    from cell_image_analysis_tpu.ops.oracle.clahe_np import equalize_adapthist_np
    from cell_image_analysis_tpu.ops.oracle.regionprops_np import regionprops_np

    def resize_oracle(img, out=64):
        factors = np.array([img.shape[0] / out, img.shape[1] / out])
        sigma = np.maximum(0.0, (factors - 1.0) / 2.0)
        x = img.astype(np.float64)
        if np.any(sigma > 0):
            x = ndi.gaussian_filter(x, sigma, mode="mirror")
        return ndi.zoom(x, (out / img.shape[0], out / img.shape[1]), order=1,
                        mode="mirror", grid_mode=True)

    model, params, host = _fit_params()
    frames = _make_frames(n_frames, size, n_cells)
    stardist_segment = (_keras_unet_segment_cpu(size)
                        if backend == "stardist" else None)

    import jax.numpy as jnp
    from cell_image_analysis_tpu.models.cae import encode, reconstruction_errors

    t0 = time.perf_counter()
    total = 0
    for f in frames:
        seg = f[..., 2].astype(np.float64)
        green = f[..., 1].astype(np.float64)
        lo, hi = np.percentile(seg, 3), np.percentile(seg, 99.8)
        norm = (seg - lo) / (hi - lo + 1e-20)
        if stardist_segment is not None:
            labels = stardist_segment(norm)
        else:
            thresh = np.percentile(norm, 90.0)
            mask = ndi.binary_opening(norm > thresh)
            labels, _ = ndi.label(mask)
        h, w = labels.shape
        cells = []
        for p in regionprops_np(labels, green):
            minr, minc, maxr, maxc = p["bbox"]
            if minr < 10 or minc < 10 or maxr > h - 10 or maxc > w - 10:
                continue
            if p["area"] < 200 or p["area"] > 8000 or p["eccentricity"] > 0.95:
                continue
            crop = green[minr:maxr, minc:maxc]
            if crop.mean() < 0.5 or crop.std() < 0.1:
                continue
            cells.append(resize_oracle(equalize_adapthist_np(crop)))
        if not cells:
            continue
        X = np.stack(cells).astype(np.float32)[..., None]
        # scoring via the host-side fitted estimators (sklearn-equivalent path)
        mse, mae = (np.asarray(a) for a in
                    reconstruction_errors(model, params.cae_variables, jnp.asarray(X)))
        feats = np.asarray(encode(model, params.cae_variables, jnp.asarray(X)))
        reduced = host["pca"].transform(np.asarray(host["scaler"].transform(feats)))
        host["cons"].predict(np.asarray(reduced))
        host["mod"].predict(np.asarray(reduced))
        total += len(cells)
    dt = time.perf_counter() - t0
    return dict(cells=total, seconds=dt, cells_per_sec=total / dt, n_frames=n_frames, size=size)


def load_cpu_baseline(backend: str = "threshold") -> float | None:
    path = _BASELINE_STARDIST_PATH if backend == "stardist" else _BASELINE_PATH
    if os.path.exists(path):
        with open(path) as f:
            return json.load(f)["cells_per_sec"]
    return None


_BASELINE_TRAIN_PATH = os.path.join(_REPO_ROOT, "CPU_BASELINE_TRAIN.json")


def run_cpu_train_reference(n_cells: int = 2048, epochs: int = 2) -> dict:
    """Keras-on-CPU CAE training throughput — the reference's hot loop #3
    (CAE_improved_modeltrain.py:231-302): `model.fit` on synthetic 64x64
    cells, batch 32, Adam(1e-3)/MSE/MAE, 80/20 split.  No
    ImageDataGenerator — GENEROUS to the CPU side, since the device bench
    augments on-device inside train_step; the reference's datagen.flow adds
    host-side augmentation cost on top of this number.

    Writes CPU_BASELINE_TRAIN.json.  Re-run after any change to the
    benchmarked training semantics."""
    os.environ.setdefault("CUDA_VISIBLE_DEVICES", "-1")
    from sklearn.model_selection import train_test_split

    from cell_image_analysis_tpu.io.keras_interop import (
        _require_keras,
        build_keras_cae,
    )
    from cell_image_analysis_tpu.utils.synthetic import make_cells

    keras = _require_keras()
    rng = np.random.default_rng(3)
    X = make_cells(rng, n_cells)[..., None].astype(np.float32)
    X_train, X_val = train_test_split(X, test_size=0.2, random_state=42)

    auto, _enc = build_keras_cae()
    auto.compile(optimizer=keras.optimizers.Adam(1e-3), loss="mse",
                 metrics=["mae"])
    bs = 32
    # warmup epoch compiles/initializes the TF graph machinery
    auto.fit(X_train, X_train, batch_size=bs, epochs=1,
             validation_data=(X_val, X_val), verbose=0)
    t0 = time.perf_counter()
    auto.fit(X_train, X_train, batch_size=bs, epochs=epochs,
             validation_data=(X_val, X_val), verbose=0)
    dt = time.perf_counter() - t0
    steps = len(X_train) // bs
    cells = steps * bs * epochs
    res = dict(cells=cells, seconds=dt, cells_per_sec=cells / dt,
               n_cells=n_cells, epochs=epochs, batch_size=bs,
               stack="keras-cpu")
    with open(_BASELINE_TRAIN_PATH, "w") as f:
        json.dump(res, f, indent=1)
    return res


def run_train_bench(n_cells: int = 2048, epochs: int = 12) -> str:
    """On-chip CAE training throughput (VERDICT r3 item 6): time the REAL
    production `fit_cae` loop (train/trainer.py — on-device augmentation +
    train_step + per-epoch val eval + the Keras callback triple) on
    synthetic cells, batch 32, after a 1-epoch compile warmup.  The
    per-epoch `float(...)` history fetches are explicit host syncs, so the
    timing is tunnel-correct (CLAUDE.md: block_until_ready does not
    synchronize here).  cells/s = train cells consumed per wall second,
    computed identically to run_cpu_train_reference.

    epochs=12: the timed fit pays a ONE-TIME ~26 MB training-set upload
    (~1.1 s on this tunnel) that the Keras-CPU baseline never pays (its
    data is in RAM and its compile-warmup epoch is excluded), so short
    fits understate the steady-state rate the reference's 100-epoch runs
    would see (measured: epochs=2 1410, 4 1867, 12 2387 cells/s;
    marginal-epoch rate 2772 — BENCH.md r5s1).  12 epochs amortizes the
    upload to <10% while keeping the bench under ~10 s warm."""
    from cell_image_analysis_tpu.config import TrainConfig
    from cell_image_analysis_tpu.train.trainer import fit_cae
    from cell_image_analysis_tpu.utils.synthetic import make_cells

    rng = np.random.default_rng(3)
    X = make_cells(rng, n_cells)[..., None].astype(np.float32)
    bs = 32
    # the warmup shares the timed call's jit cache: make_optimizer memoizes
    # the tx (a static argname of train_epoch), and epoch count does not
    # enter the trace, so the epochs=1 warmup compiles everything the
    # epochs=N run dispatches (ADVICE r4 #5)
    fit_cae(X, train_cfg=TrainConfig(epochs=1), verbose=False)  # compile
    t0 = time.perf_counter()
    fit_cae(X, train_cfg=TrainConfig(epochs=epochs), verbose=False)
    dt = time.perf_counter() - t0
    # same split fit_cae itself uses (sklearn rounds the test count UP)
    from sklearn.model_selection import train_test_split

    n_train = len(train_test_split(
        np.arange(len(X)), test_size=0.2, random_state=42)[0])
    steps = n_train // bs
    cells_per_sec = steps * bs * epochs / dt
    base = None
    if os.path.exists(_BASELINE_TRAIN_PATH):
        with open(_BASELINE_TRAIN_PATH) as f:
            base = json.load(f)["cells_per_sec"]
    out = {
        "metric": "cae_train_cells_per_sec_per_chip",
        "value": round(cells_per_sec, 2),
        "unit": "cells/s/chip",
        "vs_baseline": round(cells_per_sec / base, 2) if base else None,
    }
    return json.dumps(out)


def run_bench(n_frames: int = 48, size: int = 1024, n_cells: int = 80,
              backend: str = "threshold") -> str:
    """Headline bench: 3 pipelined batches of 16 frames — steady-state
    multi-batch screening throughput (per-batch fetch hidden behind the next
    batch's compute, as in production pipeline/screening.py; frame_batch=16
    measured best: 8 -> 16 is +12.6%, 16 -> 32 only +3.4% more).

    backend="stardist" benches the reference's actual segmentation stack
    (U-Net -> star NMS -> rasterize) against its own CPU baseline
    (CPU_BASELINE_STARDIST.json: Keras-on-CPU forward + numpy NMS oracle).
    StarDist also runs frame_batch=16 (matches production screening's
    batch_max): the 16-frame U-Net graph OOM'd v5e HBM pre-s2d — the
    f32[16,1024,1024,32] level-0 conv activation lays out T(8,128) with 32
    channels against 128 lanes, a 4x padding expansion to 8G per buffer —
    but the s2d level-0 rewrite ((16,512,512,128), no lane padding) + late
    dist head freed it (measured r3s2: fb16 2409.1 vs fb8 2280.2, +5.7%).
    CIA_BENCH_SD_FB overrides for re-measurement."""
    fb = (int(os.environ.get("CIA_BENCH_SD_FB", "16"))
          if backend == "stardist" else 16)
    res = run_tpu_bench(n_frames=n_frames, size=size, n_cells=n_cells,
                        frame_batch=fb, backend=backend)
    base = load_cpu_baseline(backend)
    vs = res["cells_per_sec"] / base if base else None
    suffix = "_stardist" if backend == "stardist" else ""
    out = {
        "metric": f"screening_cells_per_sec_per_chip{suffix}",
        "value": round(res["cells_per_sec"], 2),
        "unit": "cells/s/chip",
        "vs_baseline": round(vs, 2) if vs else None,
    }
    return json.dumps(out)
