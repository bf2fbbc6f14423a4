#!/usr/bin/env python
"""Microbenchmark: clahe_cells impl='mxu' vs 'pallas' on the real TPU.

Times the full stage-B fused path shape (chunk crops at bucket caps 96/192)
with explicit host fetches (jax.block_until_ready does not sync through the
axon tunnel — see CLAUDE.md); reports per-call ms after warmup, best of 3.
"""
import sys, time

sys.path.insert(0, ".")

from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.ops.clahe import clahe_cells


def run(impl, chunk, cap, reps=3):
    rng = np.random.default_rng(0)
    crops = jnp.asarray(rng.uniform(0, 3000, size=(chunk, cap, cap)).astype(np.float32))
    hs = jnp.asarray(rng.integers(15, cap + 1, size=chunk).astype(np.int32))
    ws = jnp.asarray(rng.integers(15, cap + 1, size=chunk).astype(np.int32))
    out = clahe_cells(crops, hs, ws, impl=impl)
    _ = float(out.sum())  # warm compile + sync
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = clahe_cells(crops, hs, ws, impl=impl)
        s = float(out.sum())
        best = min(best, time.perf_counter() - t0)
    return best * 1e3, s


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for chunk, cap in [(128, 96), (128, 192)]:
        for impl in ("mxu", "pallas"):
            try:
                ms, s = run(impl, chunk, cap)
                print(f"chunk={chunk} cap={cap} impl={impl}: {ms:8.1f} ms  (sum={s:.1f})")
            except Exception as e:
                print(f"chunk={chunk} cap={cap} impl={impl}: FAILED {type(e).__name__}: {e}")
