#!/usr/bin/env python
"""Localize the r2s9 precision-fix cost: run the official bench with each
fix flipped back to the TPU default (CIA_PREC_ABLATE / CIA_BENCH_SD_PREC),
one subprocess per config (env is read at import time; the jax persistent
cache keys on graph hash so repeats are cheap).

Baseline context (BENCH.md r2s9): all fixes ON = 2284.6 cells/s/chip, all
fixes OFF (pre-r2s9 code) = 3623.6.  Whichever ablation recovers the gap
is the hot fix to restructure bf16-exactly.
"""
import json
import os
import subprocess
import sys
import time

STEPS = [
    ("all_on", {}),
    ("unet_default", {"CIA_BENCH_SD_PREC": "default"}),
    ("clahe_single", {"CIA_PREC_ABLATE": "clahe"}),
    ("resize_default", {"CIA_PREC_ABLATE": "resize"}),
    ("fft_default", {"CIA_PREC_ABLATE": "fft"}),
    ("cae_default", {"CIA_PREC_ABLATE": "cae"}),
    ("tiny_default", {"CIA_PREC_ABLATE": "scoring,pca,svm,dist_head,nms,regionprops"}),
    ("all_off", {"CIA_BENCH_SD_PREC": "default",
                 "CIA_PREC_ABLATE":
                 "clahe,resize,fft,cae,scoring,pca,svm,dist_head,nms,regionprops"}),
]

if __name__ == "__main__":
    results = {}
    for name, env_extra in STEPS:
        env = dict(os.environ)
        env.update(env_extra)
        t0 = time.time()
        p = subprocess.run(
            [sys.executable, "bench.py"], env=env, cwd="/root/repo",
            capture_output=True, text=True, timeout=1800,
        )
        line = ""
        for ln in p.stdout.splitlines():
            if ln.startswith("{"):
                line = ln
        val = json.loads(line)["value"] if line else None
        results[name] = val
        print(f"{name:16s}: {val} cells/s/chip  ({time.time()-t0:.0f}s, rc={p.returncode})",
              flush=True)
        if p.returncode:
            print(p.stderr[-2000:], flush=True)
    print(json.dumps(results))
