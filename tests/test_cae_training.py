"""CAE model + trainer: shapes, Keras-parity details, learning smoke test."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.config import AugmentConfig, CAEConfig, TrainConfig
from cell_image_analysis_tpu.models.cae import encode, forward, init_cae, reconstruction_errors
from cell_image_analysis_tpu.train.augment import augment_batch
from cell_image_analysis_tpu.train.trainer import fit_cae


def _cells(rng, n=96):
    """Synthetic blob cells: gaussian bump + noise, values in [0,1]."""
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    cells = []
    for _ in range(n):
        cy, cx = rng.uniform(24, 40, 2)
        s = rng.uniform(6, 12)
        img = np.exp(-(((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s)))
        img += rng.normal(0, 0.03, (64, 64))
        cells.append(np.clip(img, 0, 1))
    return np.stack(cells).astype(np.float32)


def test_cae_shapes(rng):
    model, variables = init_cae(jax.random.PRNGKey(0))
    x = jnp.asarray(rng.uniform(size=(4, 64, 64, 1)).astype(np.float32))
    recon, encoded = forward(model, variables, x)
    assert recon.shape == (4, 64, 64, 1)
    assert encoded.shape == (4, 8, 8, 32)  # latent contract
    feats = encode(model, variables, x)
    assert feats.shape == (4, 2048)
    assert float(recon.min()) >= 0.0 and float(recon.max()) <= 1.0  # sigmoid


def test_cae_param_count_matches_reference_architecture():
    # Keras model.summary() for the reference architecture gives 31,169
    # trainable parameters (convs + BN gamma/beta)
    model, variables = init_cae(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))
    conv = (9 * 1 * 32 + 32) + (9 * 32 * 64 + 64) + (9 * 64 * 32 + 32) + \
           (9 * 32 * 32 + 32) + (9 * 32 * 64 + 64) + (9 * 64 * 32 + 32) + (9 * 32 * 1 + 1)
    bn = 2 * (32 + 64 + 32 + 32 + 64 + 32)
    assert n_params == conv + bn


def test_augment_preserves_shape_and_range(rng):
    x = jnp.asarray(rng.uniform(size=(8, 64, 64, 1)).astype(np.float32))
    out = augment_batch(jax.random.PRNGKey(1), x)
    assert out.shape == x.shape
    assert float(out.min()) >= -1e-6 and float(out.max()) <= 1.0 + 1e-6
    # without flips, the tiny reference transforms barely move a smooth image
    cfg = AugmentConfig(horizontal_flip=False, vertical_flip=False)
    smooth = jnp.broadcast_to(
        jnp.linspace(0, 1, 64, dtype=jnp.float32)[None, :, None, None], (4, 64, 64, 1)
    ).transpose(0, 2, 1, 3)
    out2 = augment_batch(jax.random.PRNGKey(1), smooth, cfg)
    assert float(jnp.abs(out2 - smooth).mean()) < 0.05


def test_augment_identity_when_disabled(rng):
    cfg = AugmentConfig(rotation_range=0, width_shift_range=0, height_shift_range=0,
                        zoom_range=0, horizontal_flip=False, vertical_flip=False)
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 1)).astype(np.float32))
    out = augment_batch(jax.random.PRNGKey(1), x, cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-5)


@pytest.mark.slow
def test_training_reduces_loss(rng):
    cells = _cells(rng, n=96)
    tc = TrainConfig(epochs=8, batch_size=32)
    model, variables, hist = fit_cae(cells, train_cfg=tc, verbose=False)
    losses = hist.history["loss"]
    assert losses[-1] < losses[0] * 0.8, losses
    assert len(hist.history["val_loss"]) == len(losses)
    mse, mae = reconstruction_errors(model, variables, jnp.asarray(cells[:16][..., None]))
    assert mse.shape == (16,) and float(mse.mean()) < 0.15  # smoke threshold


@pytest.mark.slow
def test_early_stopping_and_lr_schedule(rng):
    # with a tiny dataset and many epochs, early stopping must trigger and
    # the lr must decay by the plateau schedule
    cells = _cells(rng, n=48)
    tc = TrainConfig(epochs=60, batch_size=16, early_stop_patience=5, reduce_lr_patience=3)
    model, variables, hist = fit_cae(cells, train_cfg=tc, verbose=False)
    assert len(hist.history["loss"]) < 60  # stopped early
    lrs = hist.history["lr"]
    assert min(lrs) <= max(lrs)  # monotone non-increasing schedule
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))
