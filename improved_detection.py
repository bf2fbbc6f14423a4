#!/usr/bin/env python
"""Screening entry point — reference-compatible ergonomics.

The reference's `improved_detection.py` is run as `python
improved_detection.py` after editing the model dir / sample folders in main()
(README.md:15-18).  This wrapper keeps that invocation working against the
TPU-native framework: edit the dict below, or pass arguments — `python
improved_detection.py --models DIR --sample name=folder ...` accepts every
flag of `python -m cell_image_analysis_tpu.cli screen`.
"""

import sys
from datetime import datetime


def main():
    # 設定 (edit here, reference-style, or pass CLI arguments)
    model_dir = "/path/to/your/models/"
    test_folders = {
        "sample_strain_1": "/path/to/your/test/images/strain1/",
        "sample_strain_2": "/path/to/your/test/images/strain2/",
    }
    output_dir = f"./results/{datetime.now().strftime('%Y%m%d_%H%M')}_improved_screening"

    from cell_image_analysis_tpu.cli import main as cli_main

    if len(sys.argv) > 1:
        return cli_main(["screen", *sys.argv[1:]])
    args = ["screen", "--models", model_dir, "--output", output_dir]
    for name, folder in test_folders.items():
        args += ["--sample", f"{name}={folder}"]
    return cli_main(args)


if __name__ == "__main__":
    sys.exit(main())
