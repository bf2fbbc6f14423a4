#!/usr/bin/env python
"""A/B the XLA matmul/conv precision tier on the production U-Net forward.

f32 convs on the TPU MXU lower to multi-pass bfloat16: HIGHEST = 6 passes
(error ~f32), 'bfloat16_3x' = 3 passes, DEFAULT/'bfloat16' = 1 pass.  Plain
bf16 *inputs* were measured +7% but perturb the extracted cell set
(moderate-rate shift 2.6e-3 > the 1e-3 north-star, BENCH.md r2s6).  A lower
pass count keeps f32 inputs/activations (same HBM traffic) but cuts MXU
time; this probe measures time AND the prob/dist deviation + thresh flips
per tier so the parity cost is known before promoting anything.

Usage: python scripts/probe_unet_prec.py [batch] [size]
"""
import sys, time
from functools import partial

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.unet import StarDistUNet, unet_apply
from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
PROB_THRESH = 0.479

variables = load_synthetic_unet_variables()
model = StarDistUNet()
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(size=(BATCH, SIZE, SIZE, 1)).astype(np.float32))

print(f"probe_unet_prec: batch={BATCH} size={SIZE}", flush=True)

results = {}
for prec in ["highest", "high", "bfloat16", "default"]:
    if prec == "default":
        fwd = jax.jit(partial(unet_apply, model, variables))
        prob, dist = fwd(x)
    else:
        with jax.default_matmul_precision(prec):
            fwd = jax.jit(partial(unet_apply, model, variables))
            prob, dist = fwd(x)  # trace+compile inside the context
    float(prob.sum())  # force
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        p, d = fwd(x)
        float(p.sum() + d.sum())  # ONE fetch
        best = min(best, time.perf_counter() - t0)
    results[prec] = (best, np.asarray(prob), np.asarray(dist))
    print(f"  {prec:12s}: {best*1e3:8.1f} ms", flush=True)

p0, d0 = results["highest"][1], results["highest"][2]
n_above = int((p0 > PROB_THRESH).sum())
print(f"  pixels above prob_thresh (highest): {n_above}", flush=True)
for prec in ["high", "bfloat16", "default"]:
    p, d = results[prec][1], results[prec][2]
    flips = int(((p > PROB_THRESH) != (p0 > PROB_THRESH)).sum())
    print(
        f"  {prec:12s}: max|dprob|={np.abs(p - p0).max():.2e} "
        f"max|ddist|={np.abs(d - d0).max():.2e} thresh_flips={flips}",
        flush=True,
    )
