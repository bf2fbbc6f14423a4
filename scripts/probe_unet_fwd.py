#!/usr/bin/env python
"""Time the production U-Net forward (unet_forward dispatcher) on TPU —
measures whatever decoder path unet_apply currently selects.

Usage: python scripts/probe_unet_fwd.py [batch] [size]
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.unet import StarDistUNet, unet_forward
from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

variables = load_synthetic_unet_variables()
model = StarDistUNet()
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(size=(BATCH, SIZE, SIZE, 1)).astype(np.float32))


def run():
    prob, dist = unet_forward(model, variables, x)
    return float(prob.sum() + dist.sum())  # ONE device reduce + ONE fetch


print(f"probe_unet_fwd: batch={BATCH} size={SIZE}", flush=True)
run()
best = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    run()
    best = min(best, time.perf_counter() - t0)
print(f"unet_forward: {best*1e3:8.1f} ms (incl ~2 fetch round trips)", flush=True)
