"""Training checkpoint/resume.

The reference checkpoints only best-val model weights (ModelCheckpoint,
CAE_improved_modeltrain.py:270-275) — an interrupted 100-epoch run restarts
from scratch.  SURVEY.md section 5 calls for resumable training keyed to the
same artifact contract; this module adds it: the full training state
(parameters, batch stats, optimizer state, callback counters, RNG, history)
is snapshotted every epoch and `fit_cae(..., checkpoint_dir=..., resume=True)`
continues exactly where it stopped.
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

CHECKPOINT_FILE = "train_checkpoint.pkl"


def _to_numpy(tree: Any) -> Any:
    return jax.tree.map(lambda x: np.asarray(x) if hasattr(x, "shape") else x, tree)


def _to_jax(tree: Any) -> Any:
    return jax.tree.map(
        lambda x: jnp.asarray(x) if isinstance(x, np.ndarray) else x, tree
    )


def save_checkpoint(checkpoint_dir: str, state: dict) -> None:
    os.makedirs(checkpoint_dir, exist_ok=True)
    path = os.path.join(checkpoint_dir, CHECKPOINT_FILE)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(_to_numpy(state), f)
    os.replace(tmp, path)  # atomic: a crash mid-write never corrupts the file


def load_checkpoint(checkpoint_dir: str) -> Optional[dict]:
    path = os.path.join(checkpoint_dir, CHECKPOINT_FILE)
    if not os.path.exists(path):
        return None
    with open(path, "rb") as f:
        return _to_jax(pickle.load(f))
