#!/usr/bin/env python
"""Plate-scale bench row: 2048^2 frames through the fused StarDist path
(single chip; the halo-exchanged multi-chip tiler is exercised by
tests/test_tiling_pipeline.py and the dryrun — one chip has no mesh to
shard rows over, so this measures the large-frame fused graph itself).

Usage: python scripts/bench_2048.py [n_frames] [frame_batch]
"""
import json
import sys

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

from cell_image_analysis_tpu.utils.bench import run_tpu_bench

N = int(sys.argv[1]) if len(sys.argv) > 1 else 12
FB = int(sys.argv[2]) if len(sys.argv) > 2 else 2

res = run_tpu_bench(n_frames=N, size=2048, n_cells=320, frame_batch=FB,
                    backend="stardist")
print(json.dumps({
    "metric": "screening_cells_per_sec_per_chip_stardist_2048",
    "value": round(res["cells_per_sec"], 2),
    "unit": "cells/s/chip",
    "frames_per_sec": round(res["frames_per_sec"], 3),
    "cells": res["cells"],
}))
