"""Sharded scoring equals single-device scoring bit-for-bit (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cell_image_analysis_tpu.parallel.mesh import make_mesh
from cell_image_analysis_tpu.parallel.sharding import masked_anomaly_rate, replicate
from cell_image_analysis_tpu.pipeline.scoring import score_cells
from tests.test_scoring import _fitted_params


def test_sharded_scoring_matches_single_device(rng):
    model, params, _, X = _fitted_params(rng, n_train=120)
    batch = jnp.asarray(X[:64])

    single = score_cells(model, params, batch)

    mesh = make_mesh(8)
    params_r = replicate(mesh, params)
    batch_s = jax.device_put(batch, NamedSharding(mesh, P("data")))
    sharded = score_cells(model, params_r, batch_s)

    np.testing.assert_array_equal(
        np.asarray(single.conservative_predictions),
        np.asarray(sharded.conservative_predictions),
    )
    np.testing.assert_allclose(
        np.asarray(single.reconstruction_mse),
        np.asarray(sharded.reconstruction_mse), atol=1e-6,
    )
    # psum-reduced anomaly rate identical
    r1 = float(masked_anomaly_rate(single.conservative_predictions,
                                   jnp.ones(64, bool)))
    r2 = float(masked_anomaly_rate(sharded.conservative_predictions,
                                   jax.device_put(jnp.ones(64, bool), NamedSharding(mesh, P("data")))))
    assert r1 == r2
