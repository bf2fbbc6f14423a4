"""Anti-aliased image resize as MXU matmuls.

TPU-native replacement for `skimage.transform.resize(img, (64, 64),
anti_aliasing=True)` at its reference call sites
(CAE_improved_modeltrain.py:93, improved_detection.py:99).

skimage semantics being reproduced (verified against scipy.ndimage, which is
skimage's backend for this path):

1. per-axis scale ``s = in_size / out_size``;
2. Gaussian anti-aliasing pre-filter with ``sigma = max(0, (s - 1) / 2)``,
   truncated at ``radius = int(4 * sigma + 0.5)``, **mirror** boundary
   (skimage mode='reflect' maps to ndimage 'mirror');
3. bilinear (order-1) resample at ``x_i = (i + 0.5) * s - 0.5`` — the
   ``grid_mode=True`` pixel-center convention — with mirror boundary.

TPU-first design: both steps are *linear* in the input, so each axis's
(blur ∘ resample) collapses into a single ``(out, cap)`` operator matrix and
the 2-D resize becomes ``R_h @ crop @ R_w^T`` — two matmuls on the MXU, built
entirely from iota/where (no data-dependent shapes).  Variable per-cell crop
sizes (h, w) are handled by building the matrices against a static capacity
``cap`` with all weight mass confined to columns < actual size, so
capacity-padded crops need no masking.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.utils import prec


def _mirror_index(idx: jax.Array, n: jax.Array) -> jax.Array:
    """Reflect integer indices into [0, n-1] without edge duplication
    (numpy.pad mode='reflect' / ndimage mode='mirror'), assuming
    |idx| < 2*(n-1) after at most one fold (true for all our uses: pads and
    filter radii are < n).  n == 1 maps everything to 0."""
    idx = jnp.abs(idx)
    idx = jnp.where(idx > n - 1, 2 * (n - 1) - idx, idx)
    return jnp.clip(idx, 0, jnp.maximum(n - 1, 0))


def _mirror_coord(x: jax.Array, n: jax.Array) -> jax.Array:
    """Mirror a continuous coordinate into [0, n-1] (one fold suffices for
    resize coordinates, which exceed the range by < 1 px)."""
    x = jnp.abs(x)
    nf = (n - 1).astype(x.dtype)
    x = jnp.where(x > nf, 2.0 * nf - x, x)
    return jnp.clip(x, 0.0, jnp.maximum(nf, 0.0))


def _max_blur_radius(cap: int, out_size: int) -> int:
    """Static upper bound on the Gaussian truncation radius."""
    max_scale = cap / out_size
    max_sigma = max(0.0, (max_scale - 1.0) / 2.0)
    return int(4.0 * max_sigma + 0.5)


def gaussian_operator(n: jax.Array, sigma: jax.Array, cap: int, out_size: int) -> jax.Array:
    """(cap, cap) matrix G with G @ v == gaussian_filter1d(v[:n], sigma,
    truncate=4, mode='mirror') on the first n rows (rows >= n are zero).

    Matches scipy.ndimage.gaussian_filter1d: radius = int(4*sigma + 0.5),
    kernel w_t = exp(-0.5 (t/sigma)^2) normalized over |t| <= radius.
    sigma == 0 yields the (masked) identity.
    """
    R = _max_blur_radius(cap, out_size)
    p = jnp.arange(cap)
    row_valid = (p < n).astype(jnp.float32)
    radius = jnp.floor(4.0 * sigma + 0.5).astype(jnp.int32)
    sigma_safe = jnp.maximum(sigma, 1e-12)
    taps = jnp.arange(-R, R + 1)
    w = jnp.exp(-0.5 * (taps.astype(jnp.float32) / sigma_safe) ** 2)
    w = jnp.where(jnp.abs(taps) <= radius, w, 0.0)
    w = w / jnp.sum(w)
    cols = jnp.arange(cap)
    G = jnp.zeros((cap, cap), dtype=jnp.float32)
    for i in range(2 * R + 1):
        t = i - R
        q = _mirror_index(p + t, n)
        # one-hot scatter of weight w[i] from row p into column q
        G = G + w[i] * (q[:, None] == cols[None, :]).astype(jnp.float32)
    return G * row_valid[:, None]


def bilinear_operator(n: jax.Array, cap: int, out_size: int) -> jax.Array:
    """(out_size, cap) matrix B implementing order-1 grid_mode resampling of a
    length-n signal (mirror boundary): B @ v == zoom(v[:n], out/n, order=1,
    mode='mirror', grid_mode=True)."""
    s = n.astype(jnp.float32) / float(out_size)
    i = jnp.arange(out_size, dtype=jnp.float32)
    x = _mirror_coord((i + 0.5) * s - 0.5, n)
    j0 = jnp.floor(x).astype(jnp.int32)
    frac = x - j0.astype(jnp.float32)
    j1 = jnp.minimum(j0 + 1, jnp.maximum(n - 1, 0))
    cols = jnp.arange(cap)
    B = (1.0 - frac)[:, None] * (j0[:, None] == cols[None, :]) + frac[:, None] * (
        j1[:, None] == cols[None, :]
    )
    return B.astype(jnp.float32)


def resize_operator(n: jax.Array, cap: int, out_size: int) -> jax.Array:
    """Combined (out_size, cap) operator: bilinear-resample ∘ gaussian-blur
    with skimage's anti_aliasing sigma for a length-n axis."""
    s = n.astype(jnp.float32) / float(out_size)
    sigma = jnp.maximum(0.0, (s - 1.0) / 2.0)
    G = gaussian_operator(n, sigma, cap, out_size)
    B = bilinear_operator(n, cap, out_size)
    return jnp.dot(B, G, preferred_element_type=jnp.float32,
                   precision=prec.highest("resize"))


@partial(jax.jit, static_argnames=("out_size",))
def resize_cells(crops: jax.Array, heights: jax.Array, widths: jax.Array, out_size: int = 64) -> jax.Array:
    """Anti-aliased resize of a batch of capacity-padded crops.

    Args:
      crops:   (C, cap, cap) float — valid data in [0:h, 0:w] per cell,
               padding contents irrelevant (zero-weighted).
      heights: (C,) int32 actual crop heights.
      widths:  (C,) int32 actual crop widths.
      out_size: output side length (reference: 64).

    Returns (C, out_size, out_size) float32.
    """
    cap = crops.shape[-1]

    def one(crop, h, w):
        Rh = resize_operator(h, cap, out_size)           # (out, cap)
        Rw = resize_operator(w, cap, out_size)           # (out, cap)
        tmp = jnp.dot(Rh, crop.astype(jnp.float32), preferred_element_type=jnp.float32,
                      precision=prec.highest("resize"))
        return jnp.dot(tmp, Rw.T, preferred_element_type=jnp.float32,
                       precision=prec.highest("resize"))

    return jax.vmap(one)(crops, heights, widths)


@partial(jax.jit, static_argnames=("out_size",))
def resize_image(img: jax.Array, out_size: int) -> jax.Array:
    """Whole-image anti-aliased square resize (static input shape)."""
    h, w = img.shape
    Rh = resize_operator(jnp.int32(h), h, out_size)
    Rw = resize_operator(jnp.int32(w), w, out_size)
    hi = prec.highest("resize")
    return jnp.dot(jnp.dot(Rh, img.astype(jnp.float32), precision=hi), Rw.T,
                   precision=hi)
