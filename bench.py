#!/usr/bin/env python
"""Driver benchmark: prints ONE JSON line.

Metric: end-to-end screening throughput, cells/sec/chip, on synthetic
1024x1024 frames through the reference's ACTUAL pipeline (percentile
normalize -> StarDist U-Net -> star-polygon NMS -> rasterize ->
regionprops/QC -> crop gather -> CLAHE -> anti-aliased resize -> CAE ->
scaler -> PCA -> 2x RBF-SVM -> ensemble + FFT), all as jitted device
graphs.

vs_baseline compares against the CPU-reference throughput measured with
the reference's stack on CPU: Keras/TF U-Net forward (same weights) + the
numpy/scipy/sklearn oracle implementations of StarDist's C++
NMS/rasterization and the rest (CPU_BASELINE_STARDIST.json; see
cell_image_analysis_tpu/utils/bench.py and BASELINE.md — the reference
itself publishes no numbers).  `--backend threshold` benches the classical
fast path against CPU_BASELINE.json instead.
"""

import sys

sys.path.insert(0, ".")

from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

from cell_image_analysis_tpu.utils.bench import run_bench, run_train_bench

if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--backend", choices=["threshold", "stardist"],
                    default="stardist",
                    help="segmentation backend to bench: stardist (headline —"
                         " the reference's actual U-Net->NMS->rasterize stack,"
                         " vs its own CPU_BASELINE_STARDIST.json) or"
                         " threshold (the classical fast path, vs"
                         " CPU_BASELINE.json)")
    ap.add_argument("--mode", choices=["screen", "train"], default="screen",
                    help="screen (headline screening throughput) or train"
                         " (fit_cae training throughput vs the Keras-on-CPU"
                         " loop, CPU_BASELINE_TRAIN.json)")
    args = ap.parse_args()
    if args.mode == "train":
        print(run_train_bench())
    else:
        print(run_bench(backend=args.backend))
