"""Device-mesh construction.

The reference is single-process CPU (SURVEY.md section 2.4); parallelism here
is designed, not translated: a 1-D 'data' mesh shards i.i.d. work (cell
batches, frames, strain folders) and XLA lowers the collectives onto ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh_2d(shape: Sequence[int], axes: Sequence[str] = ("data", "model")) -> Mesh:
    """2-D mesh for experiments that want a model axis; the flagship models
    here fit on one chip (SURVEY.md 2.4: TP/PP/EP out of scope), so the model
    axis defaults to size 1 in production configs."""
    devs = np.array(jax.devices()[: int(np.prod(shape))]).reshape(tuple(shape))
    return Mesh(devs, tuple(axes))
