"""A/B sweep: StarDist backend frame_batch and runs-rcap knobs.

Post-top_k-run-table, stage A dropped 246->128 ms; the fb=8 cap (set when
the 16-frame U-Net graph OOMed pre-space-to-depth) and rcap=64 may be stale.
Run configs strictly sequentially on the one chip.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

from cell_image_analysis_tpu.utils.bench import run_tpu_bench  # noqa: E402

# NOTE: the bench default is now rcap=32 (this sweep's outcome) — every
# config pins CIA_BENCH_SD_RUNS_RCAP explicitly so the A/B stays
# reproducible regardless of the default.
CONFIGS = [
    ("fb=8 rcap=64", 8, {"CIA_BENCH_SD_RUNS_RCAP": "64"}),
    ("fb=16 rcap=64", 16, {"CIA_BENCH_SD_RUNS_RCAP": "64"}),
    ("fb=8 rcap=32 (current default)", 8, {"CIA_BENCH_SD_RUNS_RCAP": "32"}),
]

for name, fb, env in CONFIGS:
    saved = {}
    for k, v in env.items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        res = run_tpu_bench(n_frames=48, size=1024, n_cells=80,
                            frame_batch=fb, backend="stardist")
        print(f"{name}: {res['cells_per_sec']:.1f} cells/s", flush=True)
    except Exception as e:  # OOM etc. — report and continue
        print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
print("sweep done", flush=True)
