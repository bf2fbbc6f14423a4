"""On-device training augmentation matching Keras ImageDataGenerator.

Reference (CAE_improved_modeltrain.py:246-254): rotation_range=2 (degrees),
width/height_shift_range=0.02 (fraction), zoom_range=0.02, horizontal and
vertical flips, fill_mode='nearest'.

Keras applies these as a per-image random affine warp on the host
(scipy.ndimage order-1 with 'nearest' fill).  Here the whole batch is warped
on device: one fused gather per batch, sampled with bilinear weights and
clamped coordinates (= 'nearest' fill).  Parameter distributions match Keras:
theta ~ U(-r, r) degrees, shifts ~ U(-s, s) * size pixels, zoom zx, zy ~
U(1-z, 1+z) independently, flips with p=0.5.  (Keras composes
rotation/shift/zoom in a fixed matrix order; with symmetric ranges this
composition order has no distributional effect.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.config import AugmentConfig


def _sample_params(key: jax.Array, n: int, cfg: AugmentConfig):
    ks = jax.random.split(key, 6)
    theta = jax.random.uniform(
        ks[0], (n,), minval=-cfg.rotation_range, maxval=cfg.rotation_range
    ) * (jnp.pi / 180.0)
    ty = jax.random.uniform(ks[1], (n,), minval=-cfg.height_shift_range, maxval=cfg.height_shift_range)
    tx = jax.random.uniform(ks[2], (n,), minval=-cfg.width_shift_range, maxval=cfg.width_shift_range)
    zy = jax.random.uniform(ks[3], (n,), minval=1.0 - cfg.zoom_range, maxval=1.0 + cfg.zoom_range)
    zx = jax.random.uniform(ks[4], (n,), minval=1.0 - cfg.zoom_range, maxval=1.0 + cfg.zoom_range)
    fk = jax.random.uniform(ks[5], (n, 2))
    flip_h = (fk[:, 0] < 0.5) & cfg.horizontal_flip
    flip_v = (fk[:, 1] < 0.5) & cfg.vertical_flip
    return theta, ty, tx, zy, zx, flip_h, flip_v


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(key: jax.Array, batch: jax.Array, cfg: AugmentConfig = AugmentConfig()) -> jax.Array:
    """Random affine warp of a (B, H, W, 1) batch."""
    b, h, w, _ = batch.shape
    theta, ty, tx, zy, zx, flip_h, flip_v = _sample_params(key, b, cfg)

    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy = jnp.arange(h, dtype=jnp.float32)[:, None]
    xx = jnp.arange(w, dtype=jnp.float32)[None, :]

    def warp(img, th, dy, dx, sy, sx, fh, fv):
        cos, sin = jnp.cos(th), jnp.sin(th)
        # output (y, x) samples input at zoom(rot(centered)) + shift
        y0 = (yy - cy) * jnp.ones_like(xx)
        x0 = (xx - cx) * jnp.ones_like(yy)
        ys = (cos * y0 - sin * x0) * sy + cy + dy * h
        xs = (sin * y0 + cos * x0) * sx + cx + dx * w
        ys = jnp.where(fv, (h - 1) - ys, ys)
        xs = jnp.where(fh, (w - 1) - xs, xs)
        ys = jnp.clip(ys, 0.0, h - 1)  # 'nearest' fill = clamped sampling
        xs = jnp.clip(xs, 0.0, w - 1)
        y0i = jnp.floor(ys).astype(jnp.int32)
        x0i = jnp.floor(xs).astype(jnp.int32)
        y1i = jnp.minimum(y0i + 1, h - 1)
        x1i = jnp.minimum(x0i + 1, w - 1)
        wy = ys - y0i
        wx = xs - x0i
        im = img[..., 0]
        out = (
            im[y0i, x0i] * (1 - wy) * (1 - wx)
            + im[y0i, x1i] * (1 - wy) * wx
            + im[y1i, x0i] * wy * (1 - wx)
            + im[y1i, x1i] * wy * wx
        )
        return out[..., None]

    return jax.vmap(warp)(batch, theta, ty, tx, zy, zx, flip_h, flip_v)
