"""Weight-port utility: H5 roundtrip onto the StarDist-style U-Net."""

import numpy as np
import jax
import jax.numpy as jnp

from cell_image_analysis_tpu.models.unet import init_unet, unet_forward
from cell_image_analysis_tpu.utils.port_weights import (
    load_keras_h5_weights,
    port_conv_weights,
    save_keras_style_h5,
)


def test_h5_roundtrip_restores_unet_outputs(tmp_path, rng):
    model, variables = init_unet(jax.random.PRNGKey(3), size=64)
    p = str(tmp_path / "w.h5")
    save_keras_style_h5(p, variables["params"])

    # fresh init -> different outputs; port -> identical outputs
    _, fresh = init_unet(jax.random.PRNGKey(99), size=64)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 1)).astype(np.float32))
    prob_ref, dist_ref = unet_forward(model, variables, x)
    prob_fresh, _ = unet_forward(model, fresh, x)
    assert np.abs(np.asarray(prob_ref) - np.asarray(prob_fresh)).max() > 1e-4

    layers = load_keras_h5_weights(p)
    ported = {"params": port_conv_weights(fresh["params"], layers)}
    prob_p, dist_p = unet_forward(model, ported, x)
    np.testing.assert_allclose(np.asarray(prob_p), np.asarray(prob_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist_p), np.asarray(dist_ref), atol=1e-6)


def test_port_reports_shape_mismatch(tmp_path):
    import pytest

    model, variables = init_unet(jax.random.PRNGKey(3), size=64)
    p = str(tmp_path / "w.h5")
    save_keras_style_h5(p, variables["params"])
    layers = load_keras_h5_weights(p)[:-2]  # drop the two head layers
    with pytest.raises(ValueError, match="conv layers"):
        port_conv_weights(variables["params"], layers)
