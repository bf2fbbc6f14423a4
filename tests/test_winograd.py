"""Winograd F(2x2, 3x3) conv: pure-JAX and Pallas (interpret) vs the XLA
direct conv.  On CPU the direct conv is true f32, so the pure-JAX
formulation (HIGHEST products) must match to reassociation noise and the
Pallas kernel (explicit hi/lo bf16 3-pass products == XLA "high") to the
3-pass tier (~1e-5 relative)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cell_image_analysis_tpu.ops.winograd import (
    winograd_conv3x3,
    winograd_kernel_transform,
)


def _direct(x, W, bias):
    return jax.lax.conv_general_dilated(
        x, W, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(
        np.random.default_rng(seed).normal(size=shape).astype(np.float32) * scale
    )


@pytest.mark.parametrize(
    "b,h,w,ci,co", [(2, 16, 16, 3, 5), (1, 8, 12, 32, 64), (2, 64, 64, 1, 32)]
)
def test_winograd_jax_matches_direct(b, h, w, ci, co):
    x = _rand((b, h, w, ci), 0)
    W = _rand((3, 3, ci, co), 1, 0.2)
    bias = _rand((co,), 2, 0.1)
    ref = _direct(x, W, bias)
    y = winograd_conv3x3(x, W, bias, precision=jax.lax.Precision.HIGHEST)
    scale = float(jnp.abs(ref).max())
    assert float(jnp.abs(y - ref).max()) / scale < 1e-5


def test_kernel_transform_shape_and_identity():
    # delta kernel -> conv == identity; Winograd must reproduce it exactly
    ci = 4
    W = np.zeros((3, 3, ci, ci), np.float32)
    for c in range(ci):
        W[1, 1, c, c] = 1.0
    W = jnp.asarray(W)
    U = winograd_kernel_transform(W)
    assert U.shape == (4, 4, ci, ci)
    x = _rand((1, 8, 8, ci), 3)
    y = winograd_conv3x3(x, W, precision=jax.lax.Precision.HIGHEST)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x), rtol=0, atol=1e-6)


@pytest.mark.parametrize(
    "b,h,w,ci,co,th,tw",
    [
        (1, 64, 64, 128, 128, 16, 16),
        (2, 64, 96, 64, 128, 16, 16),
        (1, 36, 40, 32, 64, 8, 8),     # tile padding path (ho=18, wo=20)
    ],
)
def test_winograd_pallas_interpret_matches_direct(b, h, w, ci, co, th, tw):
    from cell_image_analysis_tpu.ops.pallas.winograd import winograd_conv3x3_pallas

    x = _rand((b, h, w, ci), 4, 0.5)
    W = _rand((3, 3, ci, co), 5, 1.0 / np.sqrt(9 * ci))
    bias = _rand((co,), 6, 0.1)
    ref = _direct(x, W, bias)
    y = winograd_conv3x3_pallas(x, W, bias, th=th, tw=tw, interpret=True)
    scale = float(jnp.abs(ref).max())
    # hi/lo bf16 3-pass products: ~2^-17 relative (the "high" tier)
    assert float(jnp.abs(y - ref).max()) / scale < 5e-5
