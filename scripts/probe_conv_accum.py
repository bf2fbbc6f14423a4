#!/usr/bin/env python
"""Does the TPU's DEFAULT-precision f32 conv accumulate in bf16?

r2s9 established the default f32 contraction rounds OPERANDS to bf16.  The
hi/lo packed-conv probe (probe_hilo_conv.py) then measured 2.3e-3 error
even with bf16-exact operand VALUES — which operand rounding cannot
explain.  This probe isolates where the rounding happens: a default conv
on operands that are exactly bf16-representable has zero operand-rounding
error, so any remaining deviation vs HIGHEST is internal (partial-sum /
output) rounding.

Usage: python scripts/probe_conv_accum.py
"""
import sys

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

DN = ("NHWC", "HWIO", "NHWC")


def conv(x, W, prec=None):
    return jax.lax.conv_general_dilated(
        x, W, (1, 1), "SAME", dimension_numbers=DN, precision=prec)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for ci, co, hw in [(64, 64, 128), (192, 64, 128), (576, 64, 64)]:
        x = jnp.asarray(rng.normal(size=(1, hw, hw, ci)).astype(np.float32))
        W = jnp.asarray((rng.normal(size=(3, 3, ci, co)) /
                         np.sqrt(9 * ci)).astype(np.float32))
        # bf16-exact values carried in f32
        xb = x.astype(jnp.bfloat16).astype(jnp.float32)
        Wb = W.astype(jnp.bfloat16).astype(jnp.float32)
        ref = conv(xb, Wb, jax.lax.Precision.HIGHEST)
        s = float(jnp.abs(ref).max())
        e_def = float(jnp.abs(conv(xb, Wb) - ref).max()) / s
        e_hi = float(jnp.abs(conv(xb, Wb, jax.lax.Precision.HIGH) - ref).max()) / s
        # same contraction as a matmul (im2col-free 1x1 equivalent: flatten
        # the 3x3 taps is overkill — use a plain (N, K) @ (K, co) with the
        # same K to compare op classes)
        K = 9 * ci
        a = jnp.asarray(rng.normal(size=(hw * hw, K)).astype(np.float32))
        B = jnp.asarray((rng.normal(size=(K, co)) / np.sqrt(K)).astype(np.float32))
        ab = a.astype(jnp.bfloat16).astype(jnp.float32)
        Bb = B.astype(jnp.bfloat16).astype(jnp.float32)
        mref = jnp.matmul(ab, Bb, precision=jax.lax.Precision.HIGHEST)
        ms = float(jnp.abs(mref).max())
        e_mm = float(jnp.abs(jnp.matmul(ab, Bb) - mref).max()) / ms
        print(f"  ci={ci:4d} co={co} hw={hw}: conv default {e_def:.2e}  "
              f"conv high {e_hi:.2e}  matmul default (K={K}) {e_mm:.2e}",
              flush=True)
