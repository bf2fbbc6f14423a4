"""Jitted percentile / quantile statistics and percentile normalization.

TPU-native replacements for the numpy/csbdeep statistics the reference relies
on:

- `normalize_percentile` reproduces `csbdeep.utils.normalize` defaults —
  `(x - p3) / (p99.8 - p3 + eps)` over the whole array, float32, no clipping —
  at its call sites CAE_improved_modeltrain.py:53 and improved_detection.py:62.
- `percentile` matches `numpy.percentile` (linear interpolation) so the
  RobustScaler (median/IQR) and report percentiles
  (CAE_improved_modeltrain.py:352,467-469) are bit-comparable.

Two strategies:
- `percentile` (generic, any q / axis): full `jnp.sort` — fine for feature
  matrices (~N x 2048) and report statistics.
- `percentile_select` / `kth_smallest` (static q, flat): exact order
  statistics via 32-step bisection on the order-preserving uint32 mapping —
  NO sort.  For frame-sized arrays the two 1M-element sorts in the
  segmentation threshold were ~28 ms of an 8-frame batch; the counting
  passes are at the measurement floor (scripts/probe_percentile.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("axis",))
def percentile(x: jax.Array, q, axis: int | None = None) -> jax.Array:
    """numpy-compatible percentile (linear interpolation).

    `q` may be a scalar or 1-D array of percentiles in [0, 100].  When `axis`
    is None the array is flattened.  Matches numpy's default
    ("linear"/"inclusive") interpolation:  index = q/100 * (n-1), value =
    lerp(sorted[floor], sorted[ceil]).
    """
    q = jnp.asarray(q, dtype=jnp.float32)
    if axis is None:
        xs = jnp.sort(x.reshape(-1))
        n = xs.shape[0]
        idx = q / 100.0 * (n - 1)
        lo = jnp.floor(idx).astype(jnp.int32)
        hi = jnp.ceil(idx).astype(jnp.int32)
        frac = idx - lo.astype(jnp.float32)
        return xs[lo] * (1.0 - frac) + xs[hi] * frac
    xs = jnp.sort(x, axis=axis)
    xs = jnp.moveaxis(xs, axis, 0)
    n = xs.shape[0]
    idx = q / 100.0 * (n - 1)
    lo = jnp.floor(idx).astype(jnp.int32)
    hi = jnp.ceil(idx).astype(jnp.int32)
    frac = idx - lo.astype(jnp.float32)
    if frac.ndim:  # broadcast (Q,) weights over the remaining axes
        frac = frac.reshape(frac.shape + (1,) * (xs.ndim - 1))
    take = lambda i: jnp.take(xs, i, axis=0)
    out = take(lo) * (1.0 - frac) + take(hi) * frac
    return out


@partial(jax.jit, static_argnames=("pmin", "pmax"))
def normalize_percentile(
    x: jax.Array, pmin: float = 3.0, pmax: float = 99.8, eps: float = 1e-20
) -> jax.Array:
    """csbdeep.utils.normalize semantics: percentile normalization over the
    whole array, float32 output, no clipping.

    Reference call sites: CAE_improved_modeltrain.py:53,
    improved_detection.py:62 (`normalize(seg_channel)` before StarDist).

    Uses the sort-free selection path (frame-sized arrays are the common
    input here; a 1024^2 sort costs ~18 ms on TPU, the counting passes are
    at the measurement floor).
    """
    x = x.astype(jnp.float32)
    lohi = percentile_select(x, (float(pmin), float(pmax)))
    lo, hi = lohi[0], lohi[1]
    return (x - lo) / (hi - lo + eps)


@jax.jit
def median_iqr(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-feature median and interquartile range for a (N, D) matrix.

    This is the jitted core of the RobustScaler
    (CAE_improved_modeltrain.py:408-409): center = median, scale = q75 - q25,
    with sklearn's zero-scale handling (scale == 0 -> 1) applied by the
    caller.
    """
    qs = percentile(x, jnp.array([25.0, 50.0, 75.0], dtype=jnp.float32), axis=0)
    q25, q50, q75 = qs[0], qs[1], qs[2]
    return q50, q75 - q25


@jax.jit
def masked_percentile(x: jax.Array, mask: jax.Array, q) -> jax.Array:
    """Percentile over the elements of flattened `x` where `mask` is True.

    Static-shape friendly: invalid entries are sorted to the top by replacing
    them with +inf, and the effective length is the mask count.  Used for
    percentile statistics over capacity-padded cell buffers.
    """
    q = jnp.asarray(q, dtype=jnp.float32)
    xf = x.reshape(-1).astype(jnp.float32)
    mf = mask.reshape(-1)
    xs = jnp.sort(jnp.where(mf, xf, jnp.inf))
    n = jnp.sum(mf).astype(jnp.float32)
    idx = q / 100.0 * jnp.maximum(n - 1.0, 0.0)
    lo = jnp.floor(idx).astype(jnp.int32)
    hi = jnp.ceil(idx).astype(jnp.int32)
    frac = idx - lo.astype(jnp.float32)
    return xs[lo] * (1.0 - frac) + xs[hi] * frac


def _float_to_ordered_u32(x: jax.Array) -> jax.Array:
    """Order-preserving bijection float32 -> uint32 (IEEE total order for
    non-NaN values): the k-th smallest uint corresponds to the k-th smallest
    float, so selection can run in integer space."""
    b = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jnp.where(b >> 31 == 0, b | jnp.uint32(0x80000000), ~b)


def _ordered_u32_to_float(u: jax.Array) -> jax.Array:
    b = jnp.where(u >> 31 == 1, u & jnp.uint32(0x7FFFFFFF), ~u)
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def kth_smallest(x: jax.Array, ks: tuple) -> jax.Array:
    """Exact k-th smallest elements (0-based ranks `ks`, static) of the
    flattened float32 array, WITHOUT sorting: 32-step bisection on the
    order-preserving uint32 mapping, counting all ranks in one fused pass
    per step.  Identical to `jnp.sort(x.ravel())[list(ks)]` for non-NaN
    data, and ~sort-cost/20 on TPU for frame-sized arrays (a 1024^2 sort is
    ~18 ms vs ~2 ms of counting passes; scripts/probe_percentile.py)."""
    u = _float_to_ordered_u32(x.reshape(-1).astype(jnp.float32))
    karr = jnp.asarray(ks, jnp.uint32)[:, None]
    # derive the initial bounds from data (always zero) so their type is
    # device-varying under shard_map, matching the loop body's outputs
    z = u[0] & jnp.uint32(0)
    lo = jnp.zeros((len(ks), 1), jnp.uint32) + z
    hi = jnp.full((len(ks), 1), jnp.uint32(0xFFFFFFFF)) - z

    def step(_, state):
        lo, hi = state
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((u[None, :] <= mid).astype(jnp.uint32), axis=1, keepdims=True)
        take_lo = cnt > karr  # the k-th (0-based) element is <= mid
        return jnp.where(take_lo, lo, mid + 1), jnp.where(take_lo, mid, hi)

    lo, _ = jax.lax.fori_loop(0, 32, step, (lo, hi))
    return _ordered_u32_to_float(lo[:, 0])


def percentile_ranks(n: int, qs: tuple) -> list:
    """(k_lo, k_hi, frac) triples of numpy's linear-interpolation percentile
    for a length-n array, one per q."""
    out = []
    for q in qs:
        # python float64 index arithmetic — numpy.percentile's own semantics
        # (the sort-based `percentile` computes the index in traced f32,
        # which XLA may also refold; static f64 ranks are both closer to
        # numpy and stable across backends/compilers)
        idx = q / 100.0 * (n - 1)
        k_lo = int(np.floor(idx))
        k_hi = int(np.ceil(idx))
        out.append((k_lo, k_hi, np.float32(idx - k_lo)))
    return out


@partial(jax.jit, static_argnames=("qs",))
def percentile_select(x: jax.Array, qs: tuple) -> jax.Array:
    """`percentile(x, list(qs))` (numpy linear interpolation) computed via
    `kth_smallest` instead of a full sort — same order statistics with f64
    (numpy-semantics) index arithmetic, much cheaper for frame-sized
    arrays."""
    rk = percentile_ranks(x.size, qs)
    ks = tuple(k for r in rk for k in r[:2])
    vals = kth_smallest(x, ks)
    out = []
    for i, (_, _, frac) in enumerate(rk):
        vlo, vhi = vals[2 * i], vals[2 * i + 1]
        out.append(vlo * (1.0 - jnp.float32(frac)) + vhi * jnp.float32(frac))
    return jnp.stack(out)
