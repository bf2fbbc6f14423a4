#!/usr/bin/env python
"""CC hook-iteration variants at the production rcap=32 (the rcap=64
measurements in BENCH.md predate the capacity change): hook-only with
check_every 4/8/16, and pointer-double jump (loses at rcap=64, but the
table gather is 4x smaller now).  Also reports converged iteration counts.
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.segmentation import threshold_mask
from cell_image_analysis_tpu.ops.runs import cc_runs, run_table
from cell_image_analysis_tpu.utils.bench import _make_frames

RCAP = 32

frames = _make_frames(8, 1024, 80)
segs = jnp.asarray(np.stack(frames)[..., 2].astype(np.float32))


@jax.jit
def tables(segs):
    return jax.vmap(lambda s: run_table(threshold_mask(s), rcap=RCAP))(segs)


tbl = tables(segs)


def make(check_every, jump):
    @jax.jit
    def run(tbl):
        def one(start, end, overflow):
            from cell_image_analysis_tpu.ops.runs import RunTable

            return cc_runs(RunTable(start, end, overflow),
                           check_every=check_every, jump=jump).sum()

        return jax.vmap(one)(tbl.start, tbl.end, tbl.overflow).sum()

    return run


VARIANTS = dict(
    a=("hook ce=4 (prod)", make(4, False)),
    b=("hook ce=8       ", make(8, False)),
    c=("hook ce=16      ", make(16, False)),
    d=("jump ce=4       ", make(4, True)),
    e=("jump ce=8       ", make(8, True)),
)

which = sys.argv[1] if len(sys.argv) > 1 else "abcde"
for k in which:
    name, fn = VARIANTS[k]
    t0 = time.perf_counter()
    float(fn(tbl))
    print(f"{name}: warm+compile {time.perf_counter()-t0:.1f} s", flush=True)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(tbl))
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)
