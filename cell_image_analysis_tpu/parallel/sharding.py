"""Sharding helpers: replicate parameters, shard batches, psum-reduced rates.

Design (SURVEY.md section 2.4): data parallelism is the workhorse — cells are
i.i.d. 64x64 tensors, frames and strain folders are independent.  Parameters
replicate; batch dims shard over the 'data' axis; anomaly counts reduce with
psum (a jnp.sum over a sharded axis inside jit — XLA inserts the collective).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def replicate(mesh: Mesh, tree: Any) -> Any:
    """Replicate a pytree across every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, x: Any, axis: str = "data") -> Any:
    """Shard the leading (batch) dimension of each leaf over `axis`,
    zero-padding to a multiple of the axis size so XLA keeps static shapes."""
    n = mesh.shape[axis]

    def put(leaf):
        leaf = np.asarray(leaf)
        pad = (-leaf.shape[0]) % n
        if pad:
            leaf = np.concatenate([leaf, np.zeros((pad,) + leaf.shape[1:], leaf.dtype)])
        return jax.device_put(leaf, NamedSharding(mesh, P(axis)))

    return jax.tree.map(put, x)


def pad_to_multiple(x: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    """Pad the batch dim to a multiple of n; returns (padded, valid_mask)."""
    pad = (-x.shape[0]) % n
    mask = np.ones(x.shape[0] + pad, bool)
    if pad:
        x = np.concatenate([x, np.zeros((pad,) + x.shape[1:], x.dtype)])
        mask[-pad:] = False
    return x, mask


def masked_anomaly_rate(predictions: jax.Array, valid: jax.Array) -> jax.Array:
    """fraction(pred == -1) over valid entries — the parity metric
    (improved_detection.py:151-152).  Under jit with `predictions` sharded
    over 'data', the sums become psum collectives."""
    anom = jnp.sum(jnp.where(valid, (predictions == -1).astype(jnp.float32), 0.0))
    total = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    return anom / total
