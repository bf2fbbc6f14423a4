"""Star-polygon rasterization to an instance label map, on device.

Replaces StarDist's C++ `polygons_to_label` (inside `predict_instances`,
CAE_improved_modeltrain.py:54).  Each kept polygon renders into a local
patch via the O(1) star inside-test; overlapping pixels go to the
highest-probability polygon (StarDist draws ascending so the best polygon
overwrites).  Label ids are 1..n_kept in descending-probability order,
matching StarDist's instance numbering.

Implementation: ONE scatter-max over all polygons' patch pixels with the
priority packed into the value — key = prob_q << 16 | (0xFFFF - label) — so
the whole render is a single parallel pass instead of a K-step sequential
scan (measured: the scan was ~1 s for K=512 on TPU; the scatter is the
remaining hot spot and scales with K*patch^2).  Two volume levers, both
measured on-chip:
- `raster_cap`: compact to the top-N kept polygons before rendering (the
  scatter volume is otherwise paid for suppressed/invalid candidates too);
- `patch`: scatter time tracks volume (131 -> 69 ms when the patch shrank
  96 -> 64 at K=128 x 8 frames), so size it at the plate's real cell
  diameter; oversized polygons clip to the patch (bounded approximation,
  same class as the crop_capacity gate).

Probability ties resolve to the higher-priority (lower label id = higher
prob rank) polygon; probabilities are quantized to 15 bits for the key,
which only affects ordering of polygons whose probs are within 2^-15 of
each other — and any such pair overlapping survivors is already an NMS
coin-flip.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.ops.nms import radius_at


def _scatter_patch_pass(canvas, centers, dists, keys, active, height, width, patch):
    """Scatter-max one group of polygons' patches into the flat canvas."""
    half = patch // 2
    r0 = jnp.round(centers[:, 0]).astype(jnp.int32) - half   # (K,)
    c0 = jnp.round(centers[:, 1]).astype(jnp.int32) - half

    dy = jnp.arange(patch, dtype=jnp.float32)[None, :, None]
    dx = jnp.arange(patch, dtype=jnp.float32)[None, None, :]
    py = dy + r0[:, None, None].astype(jnp.float32) - centers[:, 0][:, None, None]
    px = dx + c0[:, None, None].astype(jnp.float32) - centers[:, 1][:, None, None]
    rho = jnp.sqrt(py * py + px * px)
    theta = jnp.arctan2(py, px)
    rb = radius_at(dists[:, None, None, :], theta)           # (K, patch, patch)
    inside = (rho <= rb) & active[:, None, None]

    gy = r0[:, None, None] + jnp.arange(patch)[None, :, None]
    gx = c0[:, None, None] + jnp.arange(patch)[None, None, :]
    on_frame = (gy >= 0) & (gy < height) & (gx >= 0) & (gx < width)
    ok = inside & on_frame
    flat = jnp.where(ok, gy * width + gx, height * width)
    vals = jnp.where(ok, keys[:, None, None], 0)
    return canvas.at[flat.reshape(-1)].max(vals.reshape(-1))


@partial(jax.jit, static_argnames=("height", "width", "patch", "raster_cap"))
def rasterize_polygons(
    centers: jax.Array,   # (K, 2) float32 (row, col)
    dists: jax.Array,     # (K, R)
    probs: jax.Array,     # (K,)
    keep: jax.Array,      # (K,) bool
    height: int,
    width: int,
    patch: int = 160,
    raster_cap: int | None = None,
) -> jax.Array:
    """Returns (height, width) int32 labels.

    `raster_cap`: compact to the top-`raster_cap` kept polygons (by prob)
    before rendering.  Kept polygons beyond the cap are dropped (size it at
    the per-frame cell capacity); label ids stay 1..n descending-prob.

    `patch` clips polygons whose diameter exceeds it (the same bounded
    approximation as the crop_capacity gate); scatter volume — the measured
    hot spot — is raster_cap * patch^2, so size `patch` at the plate's real
    cell diameter, not the worst representable polygon."""
    if raster_cap is not None and raster_cap < probs.shape[0]:
        score = jnp.where(keep, probs, -jnp.inf)
        top_s, top_i = jax.lax.top_k(score, raster_cap)
        centers = centers[top_i]
        dists = dists[top_i]
        probs = probs[top_i]
        keep = jnp.isfinite(top_s)
    K = probs.shape[0]
    p = jnp.where(keep, probs, -jnp.inf)
    # label ids: 1..n in descending-prob order among kept
    order_desc = jnp.argsort(-p)
    ranks = jnp.zeros(K, jnp.int32).at[order_desc].set(jnp.arange(K, dtype=jnp.int32))
    label_ids = jnp.where(keep, ranks + 1, 0)

    # priority key: 15-bit quantized prob, low 16 bits favor smaller label
    prob_q = jnp.clip((probs * 32767.0), 0, 32767).astype(jnp.int32)
    keys = (prob_q << 16) | (0xFFFF - label_ids)

    canvas = jnp.zeros(height * width + 1, jnp.int32)
    canvas = _scatter_patch_pass(canvas, centers, dists, keys, keep,
                                 height, width, patch)
    canvas = canvas[: height * width]
    labels = jnp.where(canvas > 0, 0xFFFF - (canvas & 0xFFFF), 0)
    return labels.reshape(height, width).astype(jnp.int32)
