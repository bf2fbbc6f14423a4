#!/usr/bin/env python
"""4096^2 plate-scale bench row (BASELINE.md's "tiled 4096^2" config), single
chip: whole 4096^2 frames through the fused StarDist path at frame_batch=1.
The halo-exchanged multi-chip tiler (parallel/tiling.py, StarDist variant)
covers meshes — one chip has no mesh to shard rows over, so this measures
the large-frame fused graph itself.  If the fused graph OOMs HBM, run with
frame_batch=1 (default) and/or CIA_BENCH_SD_DTYPE=bfloat16.

Usage: python scripts/bench_4096.py [n_frames] [frame_batch]
"""
import json
import os
import sys

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

# honest plate capacities (BENCH.md r4s3/r5s4): max_candidates must be
# ~3.2x the planted density (2048 measured 37% silent cell loss), the
# 2^17 pair budget is non-binding at this density (overflow-guarded) and
# 9.7% faster than r4s3's 2^19, and frame_batch=2 is the HBM knee
# (fb=4 OOMs: a 17.4 GB interp buffer vs 17.2 GB HBM).
for k, v in {
    "CIA_BENCH_SD_CAND": "4096", "CIA_BENCH_SD_RCAP": "2048",
    "CIA_BENCH_SD_CCAP": "1024", "CIA_BENCH_SD_RUNS_RCAP": "128",
    "CIA_BENCH_SD_NMSPAIRS": "131072",
}.items():
    os.environ.setdefault(k, v)

from cell_image_analysis_tpu.utils.bench import run_tpu_bench

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
FB = int(sys.argv[2]) if len(sys.argv) > 2 else 2

res = run_tpu_bench(n_frames=N, size=4096, n_cells=1280, frame_batch=FB,
                    backend="stardist")
print(json.dumps({
    "metric": "screening_cells_per_sec_per_chip_stardist_4096",
    "value": round(res["cells_per_sec"], 2),
    "unit": "cells/s/chip",
    "frames_per_sec": round(res["frames_per_sec"], 3),
    "mpx_per_sec": round(res["frames_per_sec"] * 4096 * 4096 / 1e6, 1),
    "cells": res["cells"],
}))
