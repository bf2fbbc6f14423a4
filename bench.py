#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line.

Metric: end-to-end screening throughput, cells/sec/chip, on synthetic
1024x1024 frames (percentile-normalize -> threshold segmentation ->
regionprops/QC -> crop gather -> CLAHE -> anti-aliased resize -> CAE ->
scaler -> PCA -> 2x RBF-SVM -> ensemble + FFT), all as jitted device graphs.

vs_baseline compares against the CPU-reference throughput measured with the
numpy/scipy/sklearn oracle implementations of the same algorithms
(CPU_BASELINE.json; see cell_image_analysis_tpu/utils/bench.py and
BASELINE.md — the reference itself publishes no numbers).
"""

import sys

sys.path.insert(0, ".")

from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

from cell_image_analysis_tpu.utils.bench import run_bench

if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["threshold", "stardist"],
                    default="threshold",
                    help="segmentation backend to bench: threshold (headline)"
                         " or stardist (the reference's U-Net->NMS stack,"
                         " vs its own CPU_BASELINE_STARDIST.json)")
    args = ap.parse_args()
    print(run_bench(backend=args.backend))
