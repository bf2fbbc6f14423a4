#!/usr/bin/env python
"""On-chip A/B: XLA precision="high" 3-pass conv vs a hi/lo channel-packed
SINGLE bf16 conv computing the identical three products
(x_hi@W_hi + x_hi@W_lo + x_lo@W_hi, f32 accumulation).

Motivation (BENCH.md r3): the parity fix's U-Net cost concentrates in the
ci/co=64 512^2-spatial layers where "high" is LAYOUT-bound, not FLOP-bound
— 64-channel f32 activations pad 2x under the (8,128) lane tiling and the
3 passes re-read them.  Packing [x_hi, x_hi, x_lo] as 3Ci bf16 channels
feeds the MXU the same products in one pass over one bf16 read (same bytes
as ONE f32 pass) with full lanes.

Usage: python scripts/probe_hilo_conv.py
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


def _split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


@jax.jit
def _hilo(x, W, b):
    x_hi, x_lo = _split(x)
    W_hi, W_lo = _split(W)
    xp = jnp.concatenate([x_hi, x_hi, x_lo], axis=-1)          # (.., 3Ci) bf16
    Wp = jnp.concatenate([W_hi, W_lo, W_hi], axis=2)           # (3,3,3Ci,Co)
    y = jax.lax.conv_general_dilated(
        xp, Wp, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    ) + b
    return y.sum()


def _hilo_f32_packed(x, W):
    # bf16-exact VALUES carried in f32 arrays through a DEFAULT-precision
    # conv: the TPU's single bf16 MXU pass rounds operands (a no-op here)
    # and accumulates in f32 (probe_conv_accum.py: exact to 1e-7) — the
    # r2s9 "bf16-exact payload" trick applied to the hi/lo product
    # decomposition.  The optimization_barrier on the duplicated x_hi block
    # is LOAD-BEARING: without it XLA's algebraic simplifier merges the two
    # x_hi sub-convs into one conv with kernel W_hi + W_lo == W, which the
    # default lowering then re-rounds to bf16 (measured 2.3e-3 — the exact
    # error this decomposition exists to remove).
    x_hi, x_lo = _split(x)
    W_hi, W_lo = _split(W)
    x_hi2 = jax.lax.optimization_barrier(x_hi)
    xp = jnp.concatenate([x_hi, x_hi2, x_lo], axis=-1).astype(jnp.float32)
    Wp = jnp.concatenate([W_hi, W_lo, W_hi], axis=2).astype(jnp.float32)
    return jax.lax.conv_general_dilated(
        xp, Wp, (1, 1), "SAME", dimension_numbers=DN,
    )


@jax.jit
def _hilo_f32(x, W, b):
    return (_hilo_f32_packed(x, W) + b).sum()


@jax.jit
def _hilo_f32_val(x, W, b):
    return _hilo_f32_packed(x, W) + b


@jax.jit
def _hilo_val(x, W, b):
    x_hi, x_lo = _split(x)
    W_hi, W_lo = _split(W)
    xp = jnp.concatenate([x_hi, x_hi, x_lo], axis=-1)
    Wp = jnp.concatenate([W_hi, W_lo, W_hi], axis=2)
    return jax.lax.conv_general_dilated(
        xp, Wp, (1, 1), "SAME", dimension_numbers=DN,
        preferred_element_type=jnp.float32,
    ) + b


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    print(f"  {'layer':10s} {'default':>8s} {'high':>8s} {'hilo-bf16':>9s} "
          f"{'hilo-f32':>8s}  rel-err vs HIGHEST", flush=True)
    for name, xs, co in LAYERS:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=xs).astype(np.float32))
        W = jnp.asarray((rng.normal(size=(3, 3, xs[-1], co)) /
                         np.sqrt(9 * xs[-1])).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
        td = best_of(lambda: fetch(_direct(x, W, b, "default")))
        th = best_of(lambda: fetch(_direct(x, W, b, "high")))
        t1 = best_of(lambda: fetch(_hilo(x, W, b)))
        t2 = best_of(lambda: fetch(_hilo_f32(x, W, b)))
        # numerics on a slice (full-map compare would double HBM)
        xs_s = (1,) + (min(xs[1], 256), min(xs[2], 256)) + (xs[3],)
        xsm = x[:1, : xs_s[1], : xs_s[2]]
        ref = jax.lax.conv_general_dilated(
            xsm, W, (1, 1), "SAME", dimension_numbers=DN,
            precision=jax.lax.Precision.HIGHEST) + b
        vh = jax.lax.conv_general_dilated(
            xsm, W, (1, 1), "SAME", dimension_numbers=DN,
            precision=jax.lax.Precision.HIGH) + b
        v1 = _hilo_val(xsm, W, b)
        v2 = _hilo_f32_val(xsm, W, b)
        s = float(jnp.abs(ref).max())
        e1 = float(jnp.abs(v1 - ref).max()) / s
        e2 = float(jnp.abs(v2 - ref).max()) / s
        eh = float(jnp.abs(vh - ref).max()) / s
        print(f"  {name:10s} {td:8.1f} {th:8.1f} {t1:8.1f} {t2:8.1f}  "
              f"bf16 {e1:.2e} / f32 {e2:.2e} / high {eh:.2e}", flush=True)
