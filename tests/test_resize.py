"""Anti-aliased resize vs the scipy.ndimage oracle.

skimage.transform.resize(anti_aliasing=True, order=1, mode='reflect') is
implemented on top of scipy.ndimage: gaussian_filter(sigma=max(0,(s-1)/2),
mode='mirror') followed by zoom(order=1, mode='mirror', grid_mode=True).
scipy IS available in this environment, so the oracle is exact.
"""

import numpy as np
import jax.numpy as jnp
from scipy import ndimage as ndi

from cell_image_analysis_tpu.ops.resize import resize_cells, resize_image


def skimage_resize_oracle(img: np.ndarray, out_size: int) -> np.ndarray:
    out = np.asarray(img, dtype=np.float64)
    factors = np.array([img.shape[0] / out_size, img.shape[1] / out_size])
    sigma = np.maximum(0.0, (factors - 1.0) / 2.0)
    if np.any(sigma > 0):
        out = ndi.gaussian_filter(out, sigma, mode="mirror")
    zoom = (out_size / img.shape[0], out_size / img.shape[1])
    return ndi.zoom(out, zoom, order=1, mode="mirror", grid_mode=True)


def test_resize_downscale_matches_oracle(rng):
    img = rng.uniform(size=(150, 97)).astype(np.float32)
    ref = skimage_resize_oracle(img, 64)
    cap = 192
    crop = np.zeros((1, cap, cap), np.float32)
    crop[0, :150, :97] = img
    crop[0, 150:, :] = 99.0  # padding garbage must not leak
    out = np.asarray(resize_cells(jnp.asarray(crop), jnp.array([150]), jnp.array([97])))
    np.testing.assert_allclose(out[0], ref, atol=2e-5)


def test_resize_upscale_is_pure_bilinear(rng):
    img = rng.uniform(size=(21, 33)).astype(np.float32)
    ref = skimage_resize_oracle(img, 64)
    cap = 192
    crop = np.zeros((1, cap, cap), np.float32)
    crop[0, :21, :33] = img
    out = np.asarray(resize_cells(jnp.asarray(crop), jnp.array([21]), jnp.array([33])))
    np.testing.assert_allclose(out[0], ref, atol=2e-5)


def test_resize_batch_heterogeneous_sizes(rng):
    cap = 192
    sizes = [(150, 97), (15, 22), (192, 192), (64, 64), (101, 33)]
    crops = np.zeros((len(sizes), cap, cap), np.float32)
    imgs = []
    for i, (h, w) in enumerate(sizes):
        im = rng.uniform(size=(h, w)).astype(np.float32)
        crops[i, :h, :w] = im
        imgs.append(im)
    hs = np.array([s[0] for s in sizes], np.int32)
    ws = np.array([s[1] for s in sizes], np.int32)
    out = np.asarray(resize_cells(jnp.asarray(crops), jnp.asarray(hs), jnp.asarray(ws)))
    for i, im in enumerate(imgs):
        ref = skimage_resize_oracle(im, 64)
        np.testing.assert_allclose(out[i], ref, atol=2e-5, err_msg=f"size {sizes[i]}")


def test_resize_identity_when_same_size(rng):
    img = rng.uniform(size=(64, 64)).astype(np.float32)
    out = np.asarray(resize_image(jnp.asarray(img), 64))
    np.testing.assert_allclose(out, img, atol=1e-6)


def test_resize_image_whole_frame(rng):
    img = rng.uniform(size=(256, 256)).astype(np.float32)
    ref = skimage_resize_oracle(img, 64)
    out = np.asarray(resize_image(jnp.asarray(img), 64))
    np.testing.assert_allclose(out, ref, atol=2e-5)
