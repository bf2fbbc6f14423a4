#!/usr/bin/env python
"""On-chip A/B: XLA "high" 3-pass conv vs the wb16 2-pass conv on
bf16-exact kernels (ops/hilo_conv.wb16_conv / wb16_conv_split).

With the ARTIFACT's kernels rounded to bf16-exact f32 (round_kernels_bf16),
"high"'s three products collapse to two (W_lo == 0): x@W = x_hi@W + x_lo@W,
computable in one default conv on 2Ci-packed operands.  This probe measures
per-layer timing + numerics vs HIGHEST, then the full s2d U-Net forward
(off vs pack vs split on the ROUNDED weights) at the 8x1024^2 bench batch.

Usage: python scripts/probe_wb16.py [--fwd-only]
"""
import functools
import sys
import time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.ops.hilo_conv import wb16_conv, wb16_conv_split

LAYERS = [
    ("Conv_3", (8, 512, 512, 64), 64),
    ("Conv_12", (8, 512, 512, 64), 128),
    ("Conv_10", (8, 512, 512, 192), 64),
    ("Conv_5", (8, 256, 256, 128), 128),
    ("Conv_1s2d", (8, 512, 512, 128), 128),
    ("Conv_8", (8, 256, 256, 384), 128),
]
DN = ("NHWC", "HWIO", "NHWC")


def fetch(y):
    return float(y.sum())


def best_of(f, n=4):
    f()
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


@functools.partial(jax.jit, static_argnames=("prec",))
def _direct(x, W, b, prec):
    y = jax.lax.conv_general_dilated(
        x, W, (1, 1), "SAME", dimension_numbers=DN,
        precision=None if prec == "default" else jax.lax.Precision[prec.upper()],
    ) + b
    return y.sum()


@jax.jit
def _pack(x, W, b):
    return wb16_conv(x, W, b).sum()


@jax.jit
def _split_(x, W, b):
    return wb16_conv_split(x, W, b).sum()


@jax.jit
def _pack_val(x, W, b):
    return wb16_conv(x, W, b)


@jax.jit
def _split_val(x, W, b):
    return wb16_conv_split(x, W, b)


def per_layer():
    print(f"  {'layer':10s} {'default':>8s} {'high':>8s} {'wb16pack':>8s} "
          f"{'wb16split':>9s}  rel-err vs HIGHEST", flush=True)
    for name, xs, co in LAYERS:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=xs).astype(np.float32))
        W = np.asarray((rng.normal(size=(3, 3, xs[-1], co)) /
                        np.sqrt(9 * xs[-1])).astype(np.float32))
        W = jnp.asarray(W.astype("bfloat16").astype(np.float32))
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
        td = best_of(lambda: fetch(_direct(x, W, b, "default")))
        th = best_of(lambda: fetch(_direct(x, W, b, "high")))
        tp = best_of(lambda: fetch(_pack(x, W, b)))
        ts = best_of(lambda: fetch(_split_(x, W, b)))
        xsm = x[:1, : min(xs[1], 256), : min(xs[2], 256)]
        ref = jax.lax.conv_general_dilated(
            xsm, W, (1, 1), "SAME", dimension_numbers=DN,
            precision=jax.lax.Precision.HIGHEST) + b
        s = float(jnp.abs(ref).max())
        ep = float(jnp.abs(_pack_val(xsm, W, b) - ref).max()) / s
        es = float(jnp.abs(_split_val(xsm, W, b) - ref).max()) / s
        eh = float(jnp.abs(jax.lax.conv_general_dilated(
            xsm, W, (1, 1), "SAME", dimension_numbers=DN,
            precision=jax.lax.Precision.HIGH) + b - ref).max()) / s
        print(f"  {name:10s} {td:8.1f} {th:8.1f} {tp:8.1f} {ts:9.1f}  "
              f"pack {ep:.2e} / split {es:.2e} / high {eh:.2e}", flush=True)


def fused_forward():
    from cell_image_analysis_tpu.models.unet import StarDistUNet, apply_unet_s2d
    from cell_image_analysis_tpu.ops.hilo_conv import round_kernels_bf16
    from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

    variables = load_synthetic_unet_variables()
    rounded = {"params": round_kernels_bf16(
        jax.tree.map(np.asarray, variables["params"]))}
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 1024, 1024, 1)).astype(np.float32) * 0.3
                    + 0.2)

    outs = {}
    for mode in ("off", "pack", "pack-all", "split"):
        m = StarDistUNet(wb16=mode)

        @jax.jit
        def fwd(v, xx, m=m):
            prob, dist = apply_unet_s2d(m, v, xx)
            return prob, dist

        t = best_of(lambda: fetch(fwd(rounded, x)[0]))
        p, d = fwd(rounded, x)
        outs[mode] = (np.asarray(p[:1]), np.asarray(d[:1]))
        print(f"wb16={mode:5s}: {t:8.1f} ms", flush=True)
    for mode in ("pack", "pack-all", "split"):
        dp = np.abs(outs[mode][0] - outs["off"][0]).max()
        dd = np.abs(outs[mode][1] - outs["off"][1]).max()
        print(f"dev off-vs-{mode}: prob {dp:.2e} dist {dd:.2e}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    if "--fwd-only" not in sys.argv:
        per_layer()
    print("== full s2d forward (8x1024^2), ROUNDED kernels ==", flush=True)
    fused_forward()
