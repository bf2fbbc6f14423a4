"""Convolutional autoencoder — the reference's one trainable network.

Architecture contract (CAE_improved_modeltrain.py:184-229), input (64,64,1):
  encoder: 3 x [Conv2D f 3x3 relu same -> BatchNorm -> MaxPool 2x2 same]
           with f = 32, 64, 32  =>  latent 8x8x32 (2048-d flattened)
  decoder: 3 x [Conv2D f 3x3 relu same -> BatchNorm -> UpSample 2x2 nearest]
           with f = 32, 64, 32, then Conv2D 1 3x3 sigmoid same => (64,64,1)
  compile: Adam lr=1e-3, loss MSE, metric MAE.

Keras-parity details that matter for numeric behavior: relu is applied
*inside* the conv (i.e. before BatchNorm); BatchNorm momentum 0.99 / eps 1e-3;
glorot-uniform kernels, zero biases; UpSampling2D nearest-neighbor.

The reference builds two Keras Models over shared layers (autoencoder +
encoder, lines 219-220); here one flax module returns (decoded, encoded) and
the artifact store saves both views (config.ARTIFACT_* names).
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
from flax import linen as nn

from cell_image_analysis_tpu.utils import prec as prec_util


class CAE(nn.Module):
    """Returns (decoded, encoded)."""

    encoder_filters: tuple = (32, 64, 32)
    decoder_filters: tuple = (32, 64, 32)
    bn_momentum: float = 0.99
    bn_epsilon: float = 1e-3
    # TPU: the default f32 conv contraction is a single bf16 pass (~2^-9
    # relative error on recon/latent values feeding the SVM chain); "high"
    # (3-pass) restores ~f32 numerics.  The CAE is ~100 MFLOP/cell, so the
    # extra passes are noise next to the segmentation stage.
    precision: str = "high"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        prec = (None if self.precision in (None, "default")
                or prec_util.ablated("cae")
                else jax.lax.Precision[self.precision.upper()])
        conv = partial(
            nn.Conv,
            kernel_size=(3, 3),
            padding="SAME",
            precision=prec,
            kernel_init=jax.nn.initializers.glorot_uniform(),
        )
        bn = partial(
            nn.BatchNorm,
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=self.bn_epsilon,
        )
        for f in self.encoder_filters:
            x = nn.relu(conv(features=f)(x))
            x = bn()(x)
            x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2), padding="SAME")
        encoded = x  # (B, 8, 8, 32)
        for f in self.decoder_filters:
            x = nn.relu(conv(features=f)(x))
            x = bn()(x)
            b, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest upsample
        decoded = nn.sigmoid(conv(features=1)(x))
        return decoded, encoded


def init_cae(key: jax.Array, input_size: int = 64, **kw) -> tuple[CAE, dict]:
    """Build and initialize; returns (module, variables) with variables =
    {'params': ..., 'batch_stats': ...}."""
    model = CAE(**kw)
    variables = model.init(key, jnp.zeros((1, input_size, input_size, 1), jnp.float32), train=False)
    return model, variables


@partial(jax.jit, static_argnames=("model",))
def forward(model: CAE, variables: dict, x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Inference forward pass (running BN statistics)."""
    return model.apply(variables, x, train=False)


@partial(jax.jit, static_argnames=("model",))
def reconstruction_errors(model: CAE, variables: dict, x: jax.Array):
    """Per-cell MSE and MAE over (H, W, C) — the reference's reconstruction
    scoring (CAE_improved_modeltrain.py:338-339, improved_detection.py:126-127)."""
    recon, _ = model.apply(variables, x, train=False)
    diff = x.astype(jnp.float32) - recon
    mse = jnp.mean(diff * diff, axis=(1, 2, 3))
    mae = jnp.mean(jnp.abs(diff), axis=(1, 2, 3))
    return mse, mae


@partial(jax.jit, static_argnames=("model",))
def encode(model: CAE, variables: dict, x: jax.Array) -> jax.Array:
    """Flattened 2048-d encoder features (CAE_improved_modeltrain.py:401-402)."""
    _, encoded = model.apply(variables, x, train=False)
    return encoded.reshape(encoded.shape[0], -1)
