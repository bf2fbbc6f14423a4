#!/usr/bin/env python
"""Stage-3 parity flip diagnosis: compare device LABELS and device CELL
VALUES against the oracle at the parity workload.  Locates the ~1e-4 cell
deviation feeding the FFT detector (stage-2 ruled out the FFT math itself:
probe_tpu_fft measured XLA:TPU fft2 at 1.7e-7)."""
import sys

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.ops.extract import extract_cells_chunked
from cell_image_analysis_tpu.utils.bench import (
    _keras_unet_segment_cpu,
    _make_frames,
    stardist_backend,
)
from cell_image_analysis_tpu.utils.parity import oracle_extract_cells

SEED, N_FRAMES, SIZE, N_CELLS = 13, 2, 512, 24

print("backend:", jax.default_backend(), flush=True)
frames = _make_frames(N_FRAMES, SIZE, N_CELLS, seed=SEED)
sd = stardist_backend()
_keras_seg = _keras_unet_segment_cpu(SIZE)

for fi, f in enumerate(frames):
    seg = f[..., 2].astype(np.float64)
    green = f[..., 1].astype(np.float64)
    lo, hi = np.percentile(seg, 3), np.percentile(seg, 99.8)
    norm = (seg - lo) / (hi - lo + 1e-20)

    dev_labels = np.asarray(sd(jnp.asarray(seg.astype(np.float32)))[0])
    ref_labels = _keras_seg(norm)
    agree = (dev_labels > 0) == (ref_labels > 0)
    print(f"frame {fi}: fg pixel agreement {agree.mean():.6f} "
          f"(dev fg {(dev_labels > 0).sum()} ref fg {(ref_labels > 0).sum()}) "
          f"dev n {dev_labels.max()} ref n {ref_labels.max()}", flush=True)

    dev_cells, stats = extract_cells_chunked(
        jnp.asarray(dev_labels), jnp.asarray(green.astype(np.float32)))
    ref_cells = oracle_extract_cells(f, segment=lambda n: ref_labels)
    print(f"  cells dev {len(dev_cells)} ref {len(ref_cells)}", flush=True)
    n = min(len(dev_cells), len(ref_cells))
    for i in range(n):
        d = np.abs(dev_cells[i].astype(np.float64) - ref_cells[i])
        if d.max() > 1e-5:
            print(f"  cell {i}: maxdiff {d.max():.3e} at {np.unravel_index(d.argmax(), d.shape)} "
                  f"npix>{1e-5:.0e}: {(d > 1e-5).sum()}", flush=True)
    print(f"  overall max cell diff "
          f"{max(float(np.abs(dev_cells[i].astype(np.float64) - ref_cells[i]).max()) for i in range(n)):.3e}",
          flush=True)
