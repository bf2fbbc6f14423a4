#!/usr/bin/env python
"""Training entry point — reference-compatible ergonomics.

The reference's `CAE_improved_modeltrain.py` is run as `python
CAE_improved_modeltrain.py` after editing the paths in main()
(README.md:10-14).  This wrapper keeps that invocation working against the
TPU-native framework: edit the two paths below, or pass them as arguments —
`python CAE_improved_modeltrain.py <folder> [--output DIR ...]` accepts every
flag of `python -m cell_image_analysis_tpu.cli train`.
"""

import sys
from datetime import datetime


def main():
    # 設定 (edit here, reference-style, or pass CLI arguments)
    folder_path = "/path/to/your/training/images/"
    output_dir = f"./output/{datetime.now().strftime('%Y%m%d_%H%M')}"

    from cell_image_analysis_tpu.cli import main as cli_main

    if len(sys.argv) > 1:
        return cli_main(["train", *sys.argv[1:]])
    return cli_main(["train", folder_path, "--output", output_dir])


if __name__ == "__main__":
    sys.exit(main())
