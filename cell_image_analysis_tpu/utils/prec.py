"""Contraction-precision control for the TPU bf16-lowering fixes.

XLA:TPU lowers a DEFAULT-precision f32 matmul/conv to a SINGLE bf16 MXU
pass (both operands rounded to an 8-bit mantissa) — measured to break the
parity north-star on chip (BENCH.md r2s9).  The fixes pin explicit
precisions / bf16-exact payload splits at every contraction whose inputs
exceed bf16's exact range.

`CIA_PREC_ABLATE` (comma-separated site names, read at import time) flips
individual fixes back to the TPU default so their cost can be measured in
isolation on chip (scripts/sweep_prec.py).  Production leaves it unset.

Sites: clahe, resize, fft, regionprops, svm, pca, scoring, dist_head, nms.
(The U-Net/CAE conv tier is configured via SegConfig.unet_precision /
CAE.precision instead — they are model hyperparameters.)
"""

from __future__ import annotations

import os

import jax

_ABLATED = frozenset(
    s for s in os.environ.get("CIA_PREC_ABLATE", "").split(",") if s
)


def ablated(site: str) -> bool:
    """True when `site` is listed in CIA_PREC_ABLATE (measurement only)."""
    return site in _ABLATED


def highest(site: str):
    """jax.lax.Precision.HIGHEST, or None (backend default) when ablated."""
    return None if site in _ABLATED else jax.lax.Precision.HIGHEST


def high(site: str):
    """jax.lax.Precision.HIGH, or None (backend default) when ablated."""
    return None if site in _ABLATED else jax.lax.Precision.HIGH
