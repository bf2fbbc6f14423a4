#!/usr/bin/env python
"""Ensemble screening entry point (`improved_detection_v2.py`).

The reference README references this file (README.md:57,67) but never shipped
it (SURVEY.md claimed-but-absent surface).  This framework provides it: the
same screening pipeline with the explicit ensemble combiner surfaced as the
headline metric — per-sample ensemble anomaly rates (majority vote of
reconstruction-error threshold + Conservative SVM + Moderate SVM) printed
alongside the individual detectors.

Usage: `python improved_detection_v2.py --models DIR --sample name=folder ...`
(every `cli screen` flag), or edit the defaults below reference-style.
"""

import sys
from datetime import datetime


def main():
    model_dir = "/path/to/your/models/"
    test_folders = {
        "sample_strain_1": "/path/to/your/test/images/strain1/",
    }
    output_dir = f"./results/{datetime.now().strftime('%Y%m%d_%H%M')}_v2_screening"

    argv = sys.argv[1:]
    if not argv:
        argv = ["--models", model_dir, "--output", output_dir]
        for name, folder in test_folders.items():
            argv += ["--sample", f"{name}={folder}"]

    import argparse

    from cell_image_analysis_tpu.cli import _add_common, _apply_overrides
    from cell_image_analysis_tpu.config import PipelineConfig
    from cell_image_analysis_tpu.utils import jaxcache

    parser = argparse.ArgumentParser(prog="improved_detection_v2")
    parser.add_argument("--models", required=True)
    parser.add_argument("--sample", action="append", default=[], metavar="NAME=FOLDER")
    parser.add_argument("--output", default=None)
    _add_common(parser)
    args = parser.parse_args(argv)
    jaxcache.enable()

    samples = {}
    for s in args.sample:
        name, _, folder = s.partition("=")
        samples[name] = folder

    from cell_image_analysis_tpu.pipeline.screening import ProductionMutantScreening

    config = _apply_overrides(PipelineConfig(), args)
    out = args.output or f"./results/{datetime.now().strftime('%Y%m%d_%H%M')}_v2_screening"
    screener = ProductionMutantScreening(args.models, config)
    results, _ = screener.screen_mutant_samples(samples, out)

    print("\n=== ENSEMBLE SCREENING COMPLETED ===")
    print(f"Results saved to: {out}\n")
    print(f"{'Sample':<20} {'Ensemble':<10} {'Conservative':<13} {'Moderate':<10}")
    print("-" * 56)
    for name, r in results.items():
        print(f"{name:<20} {r['ensemble_anomaly_rate']*100:>7.1f}%  "
              f"{r['conservative_anomaly_rate']*100:>10.1f}%  "
              f"{r['moderate_anomaly_rate']*100:>7.1f}%")
    return 0


if __name__ == "__main__":
    sys.exit(main())
