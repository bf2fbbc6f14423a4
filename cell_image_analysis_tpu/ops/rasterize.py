"""Star-polygon rasterization to an instance label map, on device.

Replaces StarDist's C++ `polygons_to_label` (inside `predict_instances`,
CAE_improved_modeltrain.py:54).  Each kept polygon renders into a local
patch via the O(1) star inside-test and is scattered into the frame canvas
with `dynamic_update_slice` inside a `lax.scan`; polygons are written in
ascending-probability order so the highest-probability polygon wins
overlapping pixels (StarDist draws ascending so later/better overwrites).
Label ids are 1..n_kept in descending-probability order, matching StarDist's
instance numbering.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.ops.nms import radius_at


@partial(jax.jit, static_argnames=("height", "width", "patch"))
def rasterize_polygons(
    centers: jax.Array,   # (K, 2) float32 (row, col)
    dists: jax.Array,     # (K, R)
    probs: jax.Array,     # (K,)
    keep: jax.Array,      # (K,) bool
    height: int,
    width: int,
    patch: int = 160,
) -> jax.Array:
    """Returns (height, width) int32 labels."""
    K = probs.shape[0]
    p = jnp.where(keep, probs, -jnp.inf)
    # label ids: 1..n in descending-prob order among kept
    order_desc = jnp.argsort(-p)
    ranks = jnp.zeros(K, jnp.int32).at[order_desc].set(jnp.arange(K, dtype=jnp.int32))
    label_ids = jnp.where(keep, ranks + 1, 0)

    # draw ascending prob so better polygons overwrite
    order_asc = order_desc[::-1]

    canvas = jnp.zeros((height + 2 * patch, width + 2 * patch), jnp.int32)
    half = patch // 2

    yy = jnp.arange(patch, dtype=jnp.float32)[:, None]
    xx = jnp.arange(patch, dtype=jnp.float32)[None, :]

    def body(canvas, k):
        c = centers[k]
        d = dists[k]
        lab = label_ids[k]
        r0 = jnp.round(c[0]).astype(jnp.int32) - half + patch
        c0 = jnp.round(c[1]).astype(jnp.int32) - half + patch
        r0 = jnp.clip(r0, 0, height + patch)
        c0 = jnp.clip(c0, 0, width + patch)
        # patch-local coordinates of pixel centers
        py = yy + (r0 - patch).astype(jnp.float32) - c[0]
        px = xx + (c0 - patch).astype(jnp.float32) - c[1]
        rho = jnp.sqrt(py * py + px * px)
        theta = jnp.arctan2(py, px)
        rb = radius_at(d[None, None, :], theta)
        inside = (rho <= rb) & (lab > 0)
        tile = jax.lax.dynamic_slice(canvas, (r0, c0), (patch, patch))
        tile = jnp.where(inside, lab, tile)
        return jax.lax.dynamic_update_slice(canvas, tile, (r0, c0)), None

    canvas, _ = jax.lax.scan(body, canvas, order_asc)
    return canvas[patch : patch + height, patch : patch + width]
