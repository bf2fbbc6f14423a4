"""In-framework training for the StarDist-style U-Net.

The reference depends on downloading pretrained `2D_versatile_fluo` weights
(CAE_improved_modeltrain.py:118 — a network-touching `from_pretrained`).
This framework makes the segmentation model self-sufficient: ground-truth
generation from instance label maps (the StarDist recipe — normalized
distance transform for object probability, per-pixel star ray lengths for
distances) and a jitted training loop with the StarDist loss (BCE on prob +
prob-weighted MAE on distances).

Ground truth is prepared host-side in numpy (data prep, one-off per dataset);
training steps run on device.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
from scipy import ndimage as ndi

from cell_image_analysis_tpu.models.unet import StarDistUNet, init_unet


def star_dist_gt(labels: np.ndarray, n_rays: int = 32, max_dist: int = 64) -> np.ndarray:
    """Per-pixel star-ray distances to the instance boundary.

    For every foreground pixel and ray direction, the distance (in px) walked
    until leaving the pixel's instance.  Vectorized over pixels; O(n_rays *
    max_dist) passes over the image.
    """
    h, w = labels.shape
    dists = np.zeros((h, w, n_rays), np.float32)
    ys, xs = np.mgrid[0:h, 0:w]
    phis = 2 * np.pi * np.arange(n_rays) / n_rays
    for k, phi in enumerate(phis):
        dy, dx = np.sin(phi), np.cos(phi)
        alive = labels > 0
        d = np.zeros((h, w), np.float32)
        for t in range(1, max_dist + 1):
            yy = np.clip(np.round(ys + t * dy).astype(int), 0, h - 1)
            xx = np.clip(np.round(xs + t * dx).astype(int), 0, w - 1)
            same = labels[yy, xx] == labels
            # walking off the frame edge ends the ray too
            on_grid = (np.abs(ys + t * dy - yy) < 0.5 + 1e-6) & (np.abs(xs + t * dx - xx) < 0.5 + 1e-6)
            alive = alive & same & on_grid
            d += alive
        dists[..., k] = d
    return dists


def prob_gt(labels: np.ndarray) -> np.ndarray:
    """StarDist object probabilities: per-instance normalized Euclidean
    distance transform (1 at the medial axis, ->0 at the boundary)."""
    out = np.zeros(labels.shape, np.float32)
    edt = ndi.distance_transform_edt(labels > 0)
    for lab in range(1, int(labels.max()) + 1):
        m = labels == lab
        if not m.any():
            continue
        mx = edt[m].max()
        if mx > 0:
            out[m] = edt[m] / mx
    return out


def make_unet_training_batch(labels: np.ndarray, image: np.ndarray, grid: int = 2,
                             n_rays: int = 32):
    """(image, gt_prob, gt_dist) subsampled to the grid resolution."""
    p = prob_gt(labels)[::grid, ::grid]
    d = star_dist_gt(labels, n_rays=n_rays)[::grid, ::grid]
    return image.astype(np.float32), p, d


@partial(jax.jit, static_argnames=("model", "tx"), donate_argnums=(1, 2))
def unet_train_step(model: StarDistUNet, params, opt_state, batch, tx):
    imgs, gt_prob, gt_dist = batch

    def loss_fn(p):
        prob, dist = model.apply({"params": p}, imgs[..., None], train=True)
        eps = 1e-7
        prob = jnp.clip(prob, eps, 1 - eps)
        bce = -jnp.mean(gt_prob * jnp.log(prob) + (1 - gt_prob) * jnp.log(1 - prob))
        # prob-weighted MAE on ray distances (StarDist dist loss)
        wd = jnp.mean(gt_prob[..., None] * jnp.abs(dist - gt_dist))
        return bce + 0.2 * wd, (bce, wd)

    (loss, (bce, wd)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss, bce, wd


def fit_unet(frames: list, label_maps: list, epochs: int = 40, lr: float = 3e-4,
             n_rays: int = 32, grid: int = 2, seed: int = 42, verbose: bool = False,
             init_variables: dict | None = None):
    """Train on a list of (H, W) float frames + int label maps (all same
    shape).  Returns (model, variables) usable by models/stardist.py.

    init_variables: optional warm-start params (e.g. the committed sparse
    artifact) — fine-tuning converges the linear-gradient dist-MAE head far
    faster than training rays from scratch."""
    imgs, probs, dists = [], [], []
    for img, lab in zip(frames, label_maps):
        i, p, d = make_unet_training_batch(lab, img, grid=grid, n_rays=n_rays)
        imgs.append(i)
        probs.append(p)
        dists.append(d)
    imgs = jnp.asarray(np.stack(imgs))
    probs = jnp.asarray(np.stack(probs))
    dists = jnp.asarray(np.stack(dists))

    model, variables = init_unet(jax.random.PRNGKey(seed), size=imgs.shape[1],
                                 n_rays=n_rays, grid=(grid, grid))
    if init_variables is not None:
        variables = jax.tree.map(jnp.asarray, init_variables)
    params = variables["params"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    for e in range(epochs):
        params, opt_state, loss, bce, wd = unet_train_step(
            model, params, opt_state, (imgs, probs, dists), tx
        )
        if verbose and (e % 10 == 0 or e == epochs - 1):
            print(f"unet epoch {e}: loss {float(loss):.4f} (bce {float(bce):.4f}, dist {float(wd):.4f})")
    return model, {"params": params}
