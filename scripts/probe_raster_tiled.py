#!/usr/bin/env python
"""Compare scatter vs tiled rasterization on TPU with realistic candidates
(the 8x1024^2 bench batch through U-Net + NMS, then raster-only timing;
explicit host fetches — block_until_ready does not sync the tunnel)."""
import os
import sys
import time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np

from cell_image_analysis_tpu.models.stardist import _pad_to_multiple
from cell_image_analysis_tpu.ops.nms import star_nms
from cell_image_analysis_tpu.ops.percentile import normalize_percentile
from cell_image_analysis_tpu.ops.rasterize import (
    rasterize_polygons,
    rasterize_polygons_tiled,
)
from cell_image_analysis_tpu.utils.bench import _make_frames, stardist_backend

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

frames = _make_frames(BATCH, SIZE, 80)
segs = jnp.asarray(np.stack(frames)[..., 2].astype(np.float32))

backend = stardist_backend()
cfg, model, variables = backend.cfg, backend.model, backend.variables


@jax.jit
def candidates(segs):
    def one(seg):
        from cell_image_analysis_tpu.models.unet import unet_apply

        x = normalize_percentile(seg, cfg.norm_pmin, cfg.norm_pmax)
        x = _pad_to_multiple(x, 2 ** cfg.unet_depth)
        prob, dist = unet_apply(model, variables, x[None, :, :, None])
        p, d = prob[0], dist[0]
        hp, wp = p.shape
        top_p, top_i = jax.lax.top_k(p.reshape(-1), cfg.max_candidates)
        valid = top_p > cfg.prob_thresh
        centers = jnp.stack(
            [(top_i // wp).astype(jnp.float32) * cfg.grid[0],
             (top_i % wp).astype(jnp.float32) * cfg.grid[1]], axis=1)
        cd = jnp.maximum(d.reshape(-1, d.shape[-1])[top_i], 1e-3)
        keep = star_nms(centers, cd, top_p, valid, nms_thresh=cfg.nms_thresh,
                        metric=cfg.nms_metric)
        return centers, cd, top_p, keep
    return jax.vmap(one)(segs)


cands = candidates(segs)
cands = jax.tree.map(lambda x: jax.device_put(np.asarray(x)), cands)


@jax.jit
def raster_scatter(centers, cd, top_p, keep):
    return jax.vmap(lambda c, d, p, k: rasterize_polygons(
        c, d, p, k, SIZE, SIZE, patch=cfg.raster_patch,
        raster_cap=cfg.raster_cap or None))(centers, cd, top_p, keep)


TILE = int(os.environ.get("TILE", "128"))
MCAP = int(os.environ.get("MCAP", "16"))


@jax.jit
def raster_tiled(centers, cd, top_p, keep):
    return jax.vmap(lambda c, d, p, k: rasterize_polygons_tiled(
        c, d, p, k, SIZE, SIZE, tile=TILE, m_cap=MCAP,
        raster_cap=cfg.raster_cap or None)[0])(centers, cd, top_p, keep)


def t(name, fn, reps=4):
    r = fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        r = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)
    return r


print(f"probe_raster_tiled: batch={BATCH} size={SIZE} patch={cfg.raster_patch} "
      f"rcap={cfg.raster_cap} tile={TILE} mcap={MCAP}", flush=True)
l1 = t("scatter raster", lambda: np.asarray(raster_scatter(*cands)))
l2 = t("tiled raster  ", lambda: np.asarray(raster_tiled(*cands)))
l1, l2 = np.asarray(l1), np.asarray(l2)
# On TPU, boundary pixels can flip by 1 ulp between the two graphs (XLA
# contracts the radius_at lerp into FMA differently per fusion context —
# see CLAUDE.md); report the diff count, not bool equality.
print(f"diff px: {int((l1 != l2).sum())} / {l1.size} "
      f"(cells scatter={int(l1.max(axis=(1, 2)).sum())}"
      f" tiled={int(l2.max(axis=(1, 2)).sum())})", flush=True)
