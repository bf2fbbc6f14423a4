"""Pretrained-weight porting: Keras H5 -> this framework's flax modules.

The reference downloads pretrained StarDist `2D_versatile_fluo` weights at
runtime (CAE_improved_modeltrain.py:118).  This environment has no network
access, so the framework instead provides: (a) in-framework U-Net training
(train/unet_trainer.py), and (b) this offline porting utility for converted
checkpoints — point it at the Keras `.h5` weight file shipped inside a
StarDist model folder and it maps the conv kernels/biases onto the flax
parameter tree.

Mapping strategy: TF and flax share the HWIO conv kernel layout, so arrays
copy verbatim; layers are matched by walking both trees in creation order and
pairing identical kernel shapes (greedy, order-preserving).  Any mismatch
raises with a full report rather than silently mis-porting.  Numeric parity
of a port should be validated against recorded prob/dist head outputs (see
tests/test_port_weights.py for the self-roundtrip harness).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def load_keras_h5_weights(path: str) -> list[tuple[str, list[np.ndarray]]]:
    """Read a Keras HDF5 weights file into [(layer_name, [arrays...])] in
    stored layer order."""
    import h5py

    out: list[tuple[str, list[np.ndarray]]] = []
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f
        names = root.attrs.get("layer_names")
        if names is None:
            # no creation-order attr: fall back to natural-sorted group names
            # (h5py iterates alphabetically, which misorders conv2d_10 vs
            # conv2d_2)
            names = sorted(root.keys(), key=_natural_key)
        for raw in names:
            name = raw.decode() if isinstance(raw, bytes) else str(raw)
            g = root[name]
            wnames = g.attrs.get("weight_names", [])
            arrays = []
            for wn in wnames:
                wn = wn.decode() if isinstance(wn, bytes) else str(wn)
                arrays.append(np.array(g[wn]))
            if not arrays:  # fall back to any datasets below this group
                def collect(group, acc):
                    for k in group:
                        item = group[k]
                        if hasattr(item, "shape"):
                            acc.append(np.array(item))
                        else:
                            collect(item, acc)
                collect(g, arrays)
            if arrays:
                out.append((name, arrays))
    return out


def _natural_key(name: str):
    """Sort key that orders trailing integers numerically: flax auto-names
    submodules Conv_0..Conv_14, but tree flattening yields them in
    *alphabetical* order (Conv_10 < Conv_2), which would mis-pair same-shaped
    layers against a Keras file stored in creation order."""
    import re

    return [int(t) if t.isdigit() else t for t in re.split(r"(\d+)", name)]


def _flat_conv_params(params: dict) -> list[tuple[str, dict]]:
    """Flax conv param leaves ({kernel, bias}) in module-creation order."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    by_layer: dict[str, dict] = {}
    order: list[str] = []
    for path, leaf in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        layer = "/".join(keys[:-1])
        if layer not in by_layer:
            by_layer[layer] = {}
            order.append(layer)
        by_layer[layer][keys[-1]] = leaf
    order.sort(key=_natural_key)
    return [(name, by_layer[name]) for name in order if "kernel" in by_layer[name]]


def port_conv_weights(params: dict, h5_layers: list[tuple[str, list[np.ndarray]]]) -> dict:
    """Map H5 conv (kernel, bias) pairs onto the flax tree by shape-matched
    greedy pairing in order.  Returns a new params tree."""
    targets = _flat_conv_params(params)
    sources = [
        (name, arrs) for name, arrs in h5_layers
        if arrs and arrs[0].ndim == 4  # conv kernels only
    ]
    if len(sources) < len(targets):
        raise ValueError(
            f"H5 file has {len(sources)} conv layers; model needs {len(targets)}"
        )
    new = jax.tree_util.tree_map(lambda x: x, params)  # copy structure
    used = [False] * len(sources)
    report = []
    for tname, leaves in targets:
        kshape = tuple(leaves["kernel"].shape)
        match = None
        for i, (sname, arrs) in enumerate(sources):
            if not used[i] and tuple(arrs[0].shape) == kshape:
                match = i
                break
        if match is None:
            raise ValueError(
                f"no unused H5 conv layer with kernel shape {kshape} for {tname}; "
                f"assignments so far: {report}"
            )
        used[match] = True
        sname, arrs = sources[match]
        report.append((tname, sname))
        node = new
        parts = tname.split("/")
        for p in parts[:-1]:
            node = node[p]
        node[parts[-1]]["kernel"] = jnp.asarray(arrs[0])
        if len(arrs) > 1 and "bias" in node[parts[-1]]:
            node[parts[-1]]["bias"] = jnp.asarray(arrs[1])
    return new


def save_keras_style_h5(path: str, params: dict) -> None:
    """Write a minimal Keras-style H5 weights file from a flax tree (used by
    the roundtrip tests and as an export format)."""
    import h5py

    convs = _flat_conv_params(params)
    with h5py.File(path, "w") as f:
        f.attrs["layer_names"] = np.array(
            [name.encode() for name, _ in convs], dtype="S64"
        )
        for name, leaves in convs:
            g = f.create_group(name)
            wn = []
            for key in ("kernel", "bias"):
                if key in leaves:
                    ds = f"{name}/{key}:0"
                    g.create_dataset(ds, data=np.asarray(leaves[key]))
                    wn.append(ds.encode())
            g.attrs["weight_names"] = np.array(wn, dtype="S128")
