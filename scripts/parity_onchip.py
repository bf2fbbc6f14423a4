#!/usr/bin/env python
"""Measure the parity north-star ON THE REAL TPU (BASELINE.md: max
|anomaly-rate deviation| vs the CPU reference stack < 1e-3).

The CPU-mesh test suite (tests/test_parity.py) runs both sides in true
f32 and cannot see TPU numerics.  On the chip, the default XLA f32
contraction is a SINGLE bf16 MXU pass (both operands rounded to 8-bit
mantissa); before round-2 session 9 that made this script FAIL at
2.6e-2 (stardist) / 3.0e-2 (threshold) — one borderline SVM cell per
detector flipped.  The fixes (BENCH.md r2s9): explicit HIGHEST on every
scoring-chain matmul (resize/SVM/PCA/FFT/NMS/regionprops), "high"
3-pass convs in the U-Net and CAE, and a bf16-exact hi/lo split of the
CLAHE map payloads.

Usage: python scripts/parity_onchip.py  (on the TPU box; ~25 min of
first-compiles without a warm cache, seconds after).
"""
import json
import sys

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax

from cell_image_analysis_tpu.utils.parity import measure_parity

if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    rows = []
    worst = 0.0
    for be in ["stardist", "threshold"]:
        # fit_on_extracted: detectors fitted on pipeline-distribution cells
        # so the test rates sit near nu with many borderline cells — the
        # saturated (~100% rate) default workload can mask sub-boundary
        # numeric drift
        res = measure_parity(n_frames=2, size=512, n_cells=24, seed=13,
                             backend=be, fit_on_extracted=True)
        worst = max(worst, res["max_deviation"])
        rows.append({
            "backend": be,
            "max_deviation": res["max_deviation"],
            "cell_count_match": res["cell_count_match"],
            "device_cells": res["device"]["n_cells"],
            "ref_cells": res["reference"]["n_cells"],
            "device_rates": {k: v for k, v in res["device"].items()
                             if k.endswith("rate")},
            "ref_rates": {k: v for k, v in res["reference"].items()
                          if k.endswith("rate")},
        })
        print(json.dumps(rows[-1]), flush=True)
    ok = worst < 1e-3
    out = {"device_backend": jax.default_backend(),
           "north_star_lt_1e-3": ok, "worst": worst, "runs": rows}
    print(json.dumps({"north_star_lt_1e-3": ok, "worst": worst}), flush=True)
    with open("PARITY_ONCHIP.json", "w") as f:
        f.write(json.dumps(out, indent=1) + "\n")
    sys.exit(0 if ok else 1)
