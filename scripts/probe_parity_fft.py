#!/usr/bin/env python
"""Diagnose the stardist parity FFT-rate flip (r3): print per-cell FFT
decision values on both sides of the north-star (device fused pipeline vs
float64 oracle) at the exact parity_onchip workload, sorted by margin.

A flip caused by a cell sitting ~1e-6 from the boundary = unlucky borderline
(any formulation change flips it); ~1e-3+ = a real numeric regression in the
FFT chain or the cell pixels feeding it.
"""
import sys

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.pipeline.scoring import score_frames_fused
from cell_image_analysis_tpu.utils.bench import (
    _fit_params,
    _keras_unet_segment_cpu,
    _make_frames,
    stardist_backend,
)
from cell_image_analysis_tpu.utils.parity import (
    _svm_decision_np,
    fft_features_np,
    oracle_extract_cells,
)

SEED, N_FRAMES, SIZE, N_CELLS = 13, 2, 512, 24

print("backend:", jax.default_backend(), flush=True)

fit_frames = _make_frames(8, SIZE, N_CELLS, seed=SEED + 7919)
fit_cells = np.concatenate([oracle_extract_cells(f) for f in fit_frames], axis=0)
model, params, host = _fit_params(X=fit_cells[..., None].astype(np.float32))
frames = _make_frames(N_FRAMES, SIZE, N_CELLS, seed=SEED)
stack = np.stack(frames)

sd = stardist_backend()
fallback = stardist_backend(runs_props=False, raster_mode="scatter")
scores, stats = score_frames_fused(
    model, params,
    jnp.asarray(stack[..., 2].astype(np.float32)),
    jnp.asarray(stack[..., 1].astype(np.float32)),
    sd, fallback_segment_fn=fallback, rcap=64,
    chunk=32, caps=(64, 96), cell_capacity=128,
    label_capacity=(sd.cfg.raster_cap or sd.cfg.max_candidates),
)
# pipeline fft_scores are NEGATED decision functions (reference
# convention, improved_detection.py:149-152): pred==-1 <=> score > 0.
dev_scores = -np.asarray(scores["fft_scores"], np.float64)

_keras_seg = _keras_unet_segment_cpu(SIZE)
cells = [oracle_extract_cells(f, segment=lambda n: _keras_seg(n)) for f in frames]
cells = np.concatenate([c for c in cells if len(c)], axis=0)
f = fft_features_np(cells)
fs = (f - np.asarray(host["fft_scaler"].center_, np.float64)) / \
    np.asarray(host["fft_scaler"].scale_, np.float64)
ref_scores = _svm_decision_np(host["fft_det"], fs)

print(f"device cells {len(dev_scores)} / ref cells {len(ref_scores)}")
dv = np.sort(dev_scores)
rv = np.sort(ref_scores)
n = min(len(dv), len(rv))
print("idx  device_dec      ref_dec         |diff| (sorted by value)")
for i in range(n):
    mark = " <-- SIGN FLIP" if (dv[i] < 0) != (rv[i] < 0) else ""
    if abs(dv[i]) < 0.02 or abs(rv[i]) < 0.02 or mark:
        print(f"{i:3d} {dv[i]:+.8f} {rv[i]:+.8f} {abs(dv[i]-rv[i]):.2e}{mark}")
print("max |sorted dec diff|:", float(np.abs(dv[:n] - rv[:n]).max()))
print("device fft rate:", float((dev_scores < 0).mean()),
      "ref fft rate:", float((ref_scores < 0).mean()))
np.savez("/tmp/pfft.npz", dev=dev_scores, ref=ref_scores)
