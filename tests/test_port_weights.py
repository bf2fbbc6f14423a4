"""Weight-port utility: H5 roundtrip onto the StarDist-style U-Net."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

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


@pytest.mark.slow
def test_port_script_artifact_roundtrip(tmp_path):
    """scripts/port_stardist_h5.py end-to-end: bundled params -> Keras-style
    H5 -> ported pkl artifact that load_synthetic_unet_variables accepts,
    bit-identical params (the documented offline 2D_versatile_fluo path)."""
    import subprocess
    import sys

    from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

    v = load_synthetic_unet_variables()
    h5 = str(tmp_path / "weights_best.h5")
    save_keras_style_h5(h5, v["params"])
    out = str(tmp_path / "ported.pkl")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run([sys.executable, os.path.join(repo, "scripts", "port_stardist_h5.py"),
                        h5, "--out", out], capture_output=True, text=True, cwd=repo)
    assert r.returncode == 0, r.stdout + r.stderr
    b = load_synthetic_unet_variables(out)
    devs = jax.tree.map(lambda x, y: float(np.abs(np.asarray(x) - np.asarray(y)).max()),
                        v, b)
    assert max(jax.tree.leaves(devs)) == 0.0
