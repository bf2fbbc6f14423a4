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
import sys

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

from cell_image_analysis_tpu.utils.bench import run_tpu_bench

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4
FB = int(sys.argv[2]) if len(sys.argv) > 2 else 1

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
