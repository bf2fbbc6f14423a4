"""Command-line entry points.

The reference has no CLI — users edit hard-coded paths in `main()`
(CAE_improved_modeltrain.py:482-483, improved_detection.py:409-420;
README.md:10-18).  This framework keeps the `python <entrypoint>` ergonomics
while exposing every constant as a flag whose default is the reference value:

  python -m cell_image_analysis_tpu.cli train  INPUT_FOLDER --output OUT
  python -m cell_image_analysis_tpu.cli screen --models DIR \
         --sample strain1=/path/a --sample strain2=/path/b --output OUT
  python -m cell_image_analysis_tpu.cli bench  [--frames N --size S]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
from datetime import datetime


def _apply_overrides(config, args):
    qc = dataclasses.replace(
        config.qc,
        min_area=args.min_area, max_area=args.max_area,
        max_eccentricity=args.max_eccentricity, border_margin=args.border_margin,
        min_mean_intensity=args.min_mean_intensity, min_std_intensity=args.min_std_intensity,
    )
    seg = dataclasses.replace(
        config.seg, backend=args.backend,
        unet_winograd=(args.unet_winograd if args.unet_winograd is not None
                       else config.seg.unet_winograd),
        unet_hilo=(args.unet_hilo if args.unet_hilo is not None
                   else config.seg.unet_hilo),
        unet_wb16=(args.unet_wb16 if args.unet_wb16 is not None
                   else config.seg.unet_wb16),
    )
    train = dataclasses.replace(
        config.train, epochs=args.epochs, batch_size=args.batch_size,
        min_cells=getattr(args, "min_cells", config.train.min_cells),
    )
    det = dataclasses.replace(
        config.detector, nu_conservative=args.nu_conservative, nu_moderate=args.nu_moderate
    )
    return dataclasses.replace(config, qc=qc, seg=seg, train=train, detector=det)


def _add_common(p: argparse.ArgumentParser):
    # default = the reference's actual segmentation stack (StarDist
    # `2D_versatile_fluo` via predict_instances, improved_detection.py:44);
    # falls back to bundled weights, then to the threshold backend, with a
    # console notice (see main()).  Matches SegConfig.backend.
    p.add_argument("--backend", default="stardist", choices=["threshold", "stardist"],
                   help="segmentation backend (stardist = the reference's "
                        "stack; uses bundled weights unless --unet-weights)")
    p.add_argument("--unet-weights", default=None, help="path to U-Net weights artifact")
    p.add_argument("--unet-winograd", default=None,
                   choices=["off", "auto", "jax", "pallas"],
                   help="Winograd F(2,3) for the U-Net's high-precision 3x3 "
                        "convs (default: SegConfig.unet_winograd)")
    p.add_argument("--unet-hilo", default=None,
                   choices=["off", "auto", "all"],
                   help="hi/lo channel-packed single-pass high-precision "
                        "convs (default: SegConfig.unet_hilo)")
    p.add_argument("--unet-wb16", default=None,
                   choices=["off", "auto", "pack", "split"],
                   help="bf16-exact-kernel 2-pass high-precision convs; "
                        "'auto' uses them iff the loaded artifact's kernels "
                        "are bf16-exact (default: SegConfig.unet_wb16)")
    p.add_argument("--border-margin", type=int, default=10)
    p.add_argument("--min-area", type=int, default=200)
    p.add_argument("--max-area", type=int, default=8000)
    p.add_argument("--max-eccentricity", type=float, default=0.95)
    p.add_argument("--min-mean-intensity", type=float, default=0.5)
    p.add_argument("--min-std-intensity", type=float, default=0.1)
    p.add_argument("--epochs", type=int, default=100)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--min-cells", type=int, default=500,
                   help="abort training below this many QC cells (reference: 500)")
    p.add_argument("--nu-conservative", type=float, default=0.05)
    p.add_argument("--nu-moderate", type=float, default=0.10)
    p.add_argument("--mesh", type=int, default=0,
                   help="shard over the first N devices (0 = single device)")


def main(argv=None):
    parser = argparse.ArgumentParser(prog="cell_image_analysis_tpu")
    sub = parser.add_subparsers(dest="command", required=True)

    pt = sub.add_parser("train", help="CAE training pipeline (reference: CAE_improved_modeltrain.py)")
    pt.add_argument("input_folder")
    pt.add_argument("--output", default=None)
    _add_common(pt)

    ps = sub.add_parser("screen", help="mutant screening pipeline (reference: improved_detection.py)")
    ps.add_argument("--models", required=True, help="training output dir (artifact contract)")
    ps.add_argument("--sample", action="append", default=[], metavar="NAME=FOLDER")
    ps.add_argument("--output", default=None)
    _add_common(ps)

    pb = sub.add_parser("bench", help="throughput benchmark (one JSON line)")
    pb.add_argument("--frames", type=int, default=8)
    pb.add_argument("--size", type=int, default=1024)
    pb.add_argument("--cells-per-frame", type=int, default=80)
    # same default as bench.py (the headline measures the reference's actual
    # StarDist stack) — the two documented bench entry points must agree
    pb.add_argument("--backend", default="stardist",
                    choices=["threshold", "stardist"])

    args = parser.parse_args(argv)

    from cell_image_analysis_tpu.utils import jaxcache

    jaxcache.enable()

    if args.command == "bench":
        from cell_image_analysis_tpu.utils.bench import run_bench

        print(run_bench(n_frames=args.frames, size=args.size,
                        n_cells=args.cells_per_frame, backend=args.backend))
        return 0

    from cell_image_analysis_tpu.config import PipelineConfig

    config = _apply_overrides(PipelineConfig(), args)
    unet_variables = None
    weights_path = args.unet_weights
    if not weights_path and args.backend == "stardist":
        # fall back to the committed in-framework-trained weights
        # (scripts/make_unet_weights.py) — the no-network stand-in for the
        # reference's downloaded 2D_versatile_fluo
        default = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "assets", "unet_synthetic.pkl")
        if os.path.exists(default):
            print(f"--backend stardist without --unet-weights: using {default}")
            weights_path = default
        else:
            print("--backend stardist without --unet-weights and no bundled "
                  "weights found: falling back to the threshold backend")
    if weights_path:
        from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

        try:
            # scripts/make_unet_weights.py artifact: bare conv params
            unet_variables = load_synthetic_unet_variables(weights_path)
        except ValueError:
            from cell_image_analysis_tpu.io.artifacts import load_cae  # generic pytree loader

            unet_variables = load_cae(weights_path)[1]
    mesh = None
    if args.mesh:
        from cell_image_analysis_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(args.mesh)

    stamp = datetime.now().strftime("%Y%m%d_%H%M")
    if args.command == "train":
        from cell_image_analysis_tpu.pipeline.training import ImprovedAnomalyDetectionTraining

        out = args.output or f"./output/{stamp}"
        trainer = ImprovedAnomalyDetectionTraining(out, config, unet_variables, mesh=mesh)
        ok = trainer.run(args.input_folder)
        return 0 if ok else 1

    if args.command == "screen":
        from cell_image_analysis_tpu.pipeline.screening import ProductionMutantScreening

        samples = {}
        for s in args.sample:
            name, _, folder = s.partition("=")
            if not folder:
                parser.error(f"--sample must be NAME=FOLDER, got {s!r}")
            samples[name] = folder
        if not samples:
            parser.error("at least one --sample NAME=FOLDER is required")
        out = args.output or f"./results/{stamp}_improved_screening"
        screener = ProductionMutantScreening(args.models, config, unet_variables, mesh=mesh)
        results, _ = screener.screen_mutant_samples(samples, out)
        print("\n=== SCREENING COMPLETED ===")
        print(f"Results saved to: {out}")
        print("\nQUICK SUMMARY:")
        print(f"{'Sample':<15} {'Conservative':<12} {'Moderate':<12}")
        print("-" * 40)
        for name, r in results.items():
            print(f"{name:<15} {r['conservative_anomaly_rate'] * 100:>8.1f}% "
                  f"{r['moderate_anomaly_rate'] * 100:>10.1f}%")
        return 0


if __name__ == "__main__":
    sys.exit(main())
