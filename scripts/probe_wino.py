#!/usr/bin/env python
"""On-chip Winograd F(2,3) validation + per-layer timing (VERDICT r2 items
1/4; ADVICE r2: the Pallas hi/lo 3-pass products and the VMEM tile
heuristic had never run on the chip).

Three sections:
  1. parity: winograd_conv3x3_pallas vs the direct f32-equivalent conv
     (XLA HIGHEST) on real layer shapes — must sit at the "high" 3-pass
     tier (~1e-4 relative), same as a direct precision=HIGH conv.
  2. per-layer timing: direct conv at default/high vs Pallas Winograd
     (th 8/16 sweep — the ADVICE-flagged 128x128 t=16 boundary) for the
     production U-Net layer shapes at the 8x1024^2 batch.
  3. full forward: apply_unet_s2d winograd off vs pallas.

Usage: python scripts/probe_wino.py [section ...]   (default: all)
"""
import sys
import time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.ops.pallas.winograd import winograd_conv3x3_pallas
from cell_image_analysis_tpu.ops.winograd import winograd_conv3x3

# production U-Net layer shapes at the 8x1024^2 screening batch
# (name, (B, H, W, Ci), Co)
LAYERS = [
    ("Conv_1s2d", (8, 512, 512, 128), 128),   # t=16 boundary (ADVICE low)
    ("Conv_3", (8, 512, 512, 64), 64),
    ("Conv_5", (8, 256, 256, 128), 128),
    ("Conv_7", (8, 128, 128, 256), 256),      # t=8 tier
    ("Conv_8", (8, 256, 256, 384), 128),      # t=8 tier (concat input)
    ("Conv_10", (8, 512, 512, 192), 64),
    ("Conv_12", (8, 512, 512, 64), 128),
]


def fetch(y):
    return float(y.sum())  # explicit host fetch (block_until_ready lies here)


def best_of(f, n=4):
    f()
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        f()
        best = min(best, time.perf_counter() - t0)
    return best * 1e3


import functools


@functools.partial(jax.jit, static_argnames=("prec",))
def _direct(x, W, b, prec):
    y = jax.lax.conv_general_dilated(
        x, W, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=None if prec == "default" else jax.lax.Precision[prec.upper()],
    ) + b
    return y.sum()


@functools.partial(jax.jit, static_argnames=("th",))
def _pallas(x, W, b, th):
    return winograd_conv3x3_pallas(x, W, b, th=th, tw=th).sum()


def section_parity():
    print("== parity: pallas (hi/lo 3-pass) vs direct HIGHEST ==", flush=True)
    for name, xs, co in [("Conv_5", (2, 256, 256, 128), 128),
                         ("Conv_8", (1, 256, 256, 384), 128),
                         ("Conv_1s2d", (1, 512, 512, 128), 128)]:
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=xs).astype(np.float32))
        W = jnp.asarray((rng.normal(size=(3, 3, xs[-1], co)) /
                         np.sqrt(9 * xs[-1])).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
        ref = jax.lax.conv_general_dilated(
            x, W, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            precision=jax.lax.Precision.HIGHEST) + b
        y = winograd_conv3x3_pallas(x, W, b)
        yj = winograd_conv3x3(x, W, b, precision=jax.lax.Precision.HIGHEST)
        scale = float(jnp.abs(ref).max())
        dp = float(jnp.abs(y - ref).max()) / scale
        dj = float(jnp.abs(yj - ref).max()) / scale
        ok = "OK" if dp < 5e-4 else "FAIL"
        print(f"  {name:10s} pallas-vs-HIGHEST rel {dp:.2e}  "
              f"jax(HIGHEST)-vs-HIGHEST rel {dj:.2e}  {ok}", flush=True)


def section_layers():
    print("== per-layer timing (ms, incl ~33 ms fetch floor) ==", flush=True)
    print(f"  {'layer':10s} {'default':>8s} {'high':>8s} {'wino t=8':>9s} "
          f"{'wino t=16':>10s}", flush=True)
    for name, xs, co in LAYERS:
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=xs).astype(np.float32))
        W = jnp.asarray((rng.normal(size=(3, 3, xs[-1], co)) /
                         np.sqrt(9 * xs[-1])).astype(np.float32))
        b = jnp.asarray(rng.normal(size=(co,)).astype(np.float32) * 0.1)
        row = [best_of(lambda: fetch(_direct(x, W, b, "default"))),
               best_of(lambda: fetch(_direct(x, W, b, "high"))),
               best_of(lambda: fetch(_pallas(x, W, b, 8)))]
        try:
            row.append(best_of(lambda: fetch(_pallas(x, W, b, 16))))
        except Exception as e:  # VMEM blowout at t=16 on wide layers
            print(f"  {name}: t=16 failed: {type(e).__name__}", flush=True)
            row.append(float("nan"))
        print(f"  {name:10s} {row[0]:8.1f} {row[1]:8.1f} {row[2]:9.1f} "
              f"{row[3]:10.1f}", flush=True)


def section_forward():
    print("== full U-Net forward (8x1024^2): winograd off vs pallas ==",
          flush=True)
    from cell_image_analysis_tpu.models.unet import StarDistUNet, unet_forward
    from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

    variables = load_synthetic_unet_variables()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(size=(8, 1024, 1024, 1)).astype(np.float32))
    for wino in ("off", "auto", "pallas"):
        model = StarDistUNet(winograd=wino)

        def run():
            prob, dist = unet_forward(model, variables, x)
            return float(prob.sum() + dist.sum())

        print(f"  winograd={wino:7s}: {best_of(run):8.1f} ms", flush=True)
        if wino != "off":
            m_off = StarDistUNet(winograd="off")
            p0, d0 = unet_forward(m_off, variables, x)
            p1, d1 = unet_forward(model, variables, x)
            print(f"  prob dev off-vs-{wino}: {float(jnp.abs(p1 - p0).max()):.2e}"
                  f"  dist dev: {float(jnp.abs(d1 - d0).max()):.2e}", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    sections = sys.argv[1:] or ["parity", "layers", "forward"]
    for s in sections:
        {"parity": section_parity, "layers": section_layers,
         "forward": section_forward}[s]()
