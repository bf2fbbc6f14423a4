#!/usr/bin/env python
"""Decompose rasterize_polygons costs on TPU: tent radius vs inside-test vs
scatter-max vs label ranks, across patch sizes and caps.

Usage: python scripts/probe_raster.py
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from cell_image_analysis_tpu.ops.nms import radius_at

B, K, R, H, W = 8, 128, 32, 1024, 1024

rng = np.random.default_rng(0)
centers = jnp.asarray(rng.uniform(64, 960, (B, K, 2)).astype(np.float32))
dists = jnp.asarray(rng.uniform(5, 30, (B, K, R)).astype(np.float32))
probs = jnp.asarray(rng.uniform(0, 1, (B, K)).astype(np.float32))
keep = jnp.asarray(rng.uniform(0, 1, (B, K)) < 0.4)


def t(name, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)


def parts(patch):
    half = patch // 2

    @jax.jit
    def p_geom(centers, dists, keep):
        def one(c, d, k):
            r0 = jnp.round(c[:, 0]).astype(jnp.int32) - half
            c0 = jnp.round(c[:, 1]).astype(jnp.int32) - half
            dy = jnp.arange(patch, dtype=jnp.float32)[None, :, None]
            dx = jnp.arange(patch, dtype=jnp.float32)[None, None, :]
            py = dy + r0[:, None, None].astype(jnp.float32) - c[:, 0][:, None, None]
            px = dx + c0[:, None, None].astype(jnp.float32) - c[:, 1][:, None, None]
            rho2 = py * py + px * px
            theta = jnp.arctan2(py, px)
            rb = radius_at(d[:, None, None, :], theta)
            inside = (rho2 <= rb * rb) & k[:, None, None]
            return inside.sum()
        return jax.vmap(one)(centers, dists, keep)

    @jax.jit
    def p_scatter(centers, dists, probs, keep):
        def one(c, d, p, k):
            r0 = jnp.round(c[:, 0]).astype(jnp.int32) - half
            c0 = jnp.round(c[:, 1]).astype(jnp.int32) - half
            gy = r0[:, None, None] + jnp.arange(patch)[None, :, None]
            gx = c0[:, None, None] + jnp.arange(patch)[None, None, :]
            on = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W) & k[:, None, None]
            flat = jnp.where(on, gy * W + gx, H * W)
            vals = jnp.where(on, (p[:, None, None] * 32767).astype(jnp.int32), 0)
            canvas = jnp.zeros(H * W + 1, jnp.int32)
            canvas = canvas.at[flat.reshape(-1)].max(vals.reshape(-1))
            return canvas[: H * W].sum()
        return jax.vmap(one)(centers, dists, probs, keep)

    from cell_image_analysis_tpu.ops.rasterize import rasterize_polygons

    @jax.jit
    def p_full(centers, dists, probs, keep):
        return jax.vmap(lambda c, d, p, k: rasterize_polygons(
            c, d, p, k, H, W, patch=patch
        ))(centers, dists, probs, keep)

    t(f"patch={patch:3d} geom+inside ", lambda: float(p_geom(centers, dists, keep).sum()))
    t(f"patch={patch:3d} scatter-max ", lambda: float(p_scatter(centers, dists, probs, keep).sum()))
    t(f"patch={patch:3d} full raster ", lambda: float(p_full(centers, dists, probs, keep).sum()))


for patch in (96, 64):
    parts(patch)
