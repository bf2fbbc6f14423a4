"""Jitted percentile / quantile statistics and percentile normalization.

TPU-native replacements for the numpy/csbdeep statistics the reference relies
on:

- `normalize_percentile` reproduces `csbdeep.utils.normalize` defaults —
  `(x - p3) / (p99.8 - p3 + eps)` over the whole array, float32, no clipping —
  at its call sites CAE_improved_modeltrain.py:53 and improved_detection.py:62.
- `percentile` matches `numpy.percentile` (linear interpolation) so the
  RobustScaler (median/IQR) and report percentiles
  (CAE_improved_modeltrain.py:352,467-469) are bit-comparable.

Percentiles are computed with a full sort: XLA lowers `jax.lax.sort` to an
efficient on-device bitonic sort, and the arrays here (frames up to 4096^2,
feature matrices ~N x 2048) are comfortably HBM-resident.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


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
    """
    x = x.astype(jnp.float32)
    lohi = percentile(x, jnp.array([pmin, pmax], dtype=jnp.float32))
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
