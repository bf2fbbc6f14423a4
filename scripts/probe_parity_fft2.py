#!/usr/bin/env python
"""Stage-2 of the parity FFT flip diagnosis: compare device vs oracle FFT
FEATURE vectors per cell (unsorted, index-aligned) to localize whether the
deviation enters at the extracted pixels (features differ ~1e-2) or in the
scoring chain (features match ~1e-6, decisions differ)."""
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
dev_f = np.asarray(scores["fft_features"], np.float64)

_keras_seg = _keras_unet_segment_cpu(SIZE)
cells = [oracle_extract_cells(f, segment=lambda n: _keras_seg(n)) for f in frames]
cells = np.concatenate([c for c in cells if len(c)], axis=0)
ref_f = fft_features_np(cells)

print(f"device {dev_f.shape} / ref {ref_f.shape}")
n = min(len(dev_f), len(ref_f))
# index-aligned relative feature deviation per cell (both sides emit cells
# frame-major in QC order; areas confirm alignment)
area_dev = np.asarray(stats["area"])[:n]
rel = np.abs(dev_f[:n] - ref_f[:n]).max(axis=1) / (np.abs(ref_f[:n]).max(axis=1) + 1e-12)
order = np.argsort(rel)[::-1]
print("worst cells by relative FFT-feature deviation:")
for i in order[:8]:
    print(f"  cell {i:3d} area {area_dev[i]:6.0f} relfeat {rel[i]:.2e}")
print(f"median relfeat {np.median(rel):.2e}")
np.savez("/tmp/pfft2.npz", dev_f=dev_f, ref_f=ref_f, area=area_dev)
