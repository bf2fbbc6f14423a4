"""Real-Keras / sklearn artifact interop.

The reference's artifact directory holds genuine Keras models
(`best_autoencoder.keras`, `encoder.keras` — written by ``Model.save`` at
CAE_improved_modeltrain.py:271,299-300) and sklearn pickles (`scaler.pkl`,
`pca.pkl`, `detector_conservative.pkl`, `detector_moderate.pkl`, written at
:437-444), read back with ``keras.models.load_model`` + ``pickle.load``
(improved_detection.py:23-46).  This module converts those real artifacts
into this framework's flax/numpy forms — and back — so a model directory
trained by the reference can be screened by this framework and vice versa.

It also provides Keras twins of the framework's flax architectures
(reference CAE, StarDist-architecture U-Net) used by the cross-validation
tests: a Keras-built model with random weights is converted and must agree
with the flax forward pass to ~1e-5, which validates layer ordering, conv
layout (HWIO in both), and BatchNorm statistic mapping against the real
Keras implementation rather than a self-roundtrip.

Keras/TF are optional: importing this module is cheap, and every entry point
raises a clear ImportError when Keras is unavailable.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np


def _require_keras():
    try:
        import keras  # noqa: F401
    except Exception as e:  # pragma: no cover - environment-dependent
        raise ImportError(
            "keras is required for real-Keras artifact interop "
            "(pip install keras tensorflow)"
        ) from e
    import keras

    return keras


# ---------------------------------------------------------------------------
# Keras twins of the flax architectures
# ---------------------------------------------------------------------------

def build_keras_cae(input_size: int = 64,
                    encoder_filters=(32, 64, 32),
                    decoder_filters=(32, 64, 32)):
    """The reference CAE (CAE_improved_modeltrain.py:184-229) as a real Keras
    model pair (autoencoder, encoder) over shared layers."""
    keras = _require_keras()
    from keras import layers

    inp = layers.Input((input_size, input_size, 1))
    x = inp
    for f in encoder_filters:
        x = layers.Conv2D(f, (3, 3), activation="relu", padding="same")(x)
        x = layers.BatchNormalization()(x)
        x = layers.MaxPooling2D((2, 2), padding="same")(x)
    encoded = x
    for f in decoder_filters:
        x = layers.Conv2D(f, (3, 3), activation="relu", padding="same")(x)
        x = layers.BatchNormalization()(x)
        x = layers.UpSampling2D((2, 2))(x)
    decoded = layers.Conv2D(1, (3, 3), activation="sigmoid", padding="same")(x)
    autoencoder = keras.Model(inp, decoded)
    encoder = keras.Model(inp, encoded)
    return autoencoder, encoder


def build_keras_stardist_unet(n_rays: int = 32, depth: int = 3,
                              base_filters: int = 32, head_filters: int = 128,
                              grid=(2, 2), input_size: int = 256):
    """Keras twin of models/unet.StarDistUNet (2D_versatile_fluo contract:
    SURVEY.md section 2.2.3) — layer creation order matches the flax module's
    call order so ordered weight pairing is exact."""
    import math

    keras = _require_keras()
    from keras import layers

    inp = layers.Input((input_size, input_size, 1))
    h = inp
    skips = []
    for lvl in range(depth):
        f = base_filters * (2 ** lvl)
        h = layers.Conv2D(f, (3, 3), activation="relu", padding="same")(h)
        h = layers.Conv2D(f, (3, 3), activation="relu", padding="same")(h)
        skips.append(h)
        h = layers.MaxPooling2D((2, 2), padding="same")(h)
    f = base_filters * (2 ** depth)
    h = layers.Conv2D(f, (3, 3), activation="relu", padding="same")(h)
    h = layers.Conv2D(f, (3, 3), activation="relu", padding="same")(h)

    stop = int(math.log2(grid[0]))
    for lvl in reversed(range(stop, depth)):
        f = base_filters * (2 ** lvl)
        h = layers.UpSampling2D((2, 2))(h)
        h = layers.Concatenate()([h, skips[lvl]])
        h = layers.Conv2D(f, (3, 3), activation="relu", padding="same")(h)
        h = layers.Conv2D(f, (3, 3), activation="relu", padding="same")(h)

    feat = layers.Conv2D(head_filters, (3, 3), activation="relu", padding="same")(h)
    prob = layers.Conv2D(1, (1, 1), activation="sigmoid")(feat)
    dist = layers.Conv2D(n_rays, (1, 1), activation="softplus")(feat)
    return keras.Model(inp, [prob, dist])


# ---------------------------------------------------------------------------
# Keras model -> flax variables
# ---------------------------------------------------------------------------

def _ordered_layers(model, cls_name: str) -> list:
    return [l for l in model.layers if type(l).__name__ == cls_name]


def _natural(names):
    from cell_image_analysis_tpu.utils.port_weights import _natural_key

    return sorted(names, key=_natural_key)


def cae_variables_from_keras(autoencoder) -> dict:
    """Convert a loaded reference CAE Keras model into this framework's flax
    variables {'params', 'batch_stats'}.  Pairing is by creation order:
    Keras Conv2D k <-> flax Conv_k, BatchNormalization k <-> BatchNorm_k —
    both frameworks create layers in the same call order and share the HWIO
    conv kernel layout, so arrays copy verbatim (shape-asserted)."""
    import jax.numpy as jnp

    convs = _ordered_layers(autoencoder, "Conv2D")
    bns = _ordered_layers(autoencoder, "BatchNormalization")
    params: dict[str, Any] = {}
    stats: dict[str, Any] = {}
    for i, layer in enumerate(convs):
        w = layer.get_weights()
        params[f"Conv_{i}"] = {
            "kernel": jnp.asarray(w[0]),
            "bias": jnp.asarray(w[1]) if len(w) > 1
            else jnp.zeros((w[0].shape[-1],), jnp.float32),
        }
    for i, layer in enumerate(bns):
        gamma, beta, mean, var = layer.get_weights()
        params[f"BatchNorm_{i}"] = {
            "scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)
        }
        stats[f"BatchNorm_{i}"] = {
            "mean": jnp.asarray(mean), "var": jnp.asarray(var)
        }
    return {"params": params, "batch_stats": stats}


def unet_variables_from_keras(model) -> dict:
    """Convert a StarDist-architecture Keras U-Net (conv-only) into flax
    variables for models/unet.StarDistUNet."""
    import jax.numpy as jnp

    convs = _ordered_layers(model, "Conv2D")
    params: dict[str, Any] = {}
    for i, layer in enumerate(convs):
        w = layer.get_weights()
        params[f"Conv_{i}"] = {
            "kernel": jnp.asarray(w[0]),
            "bias": jnp.asarray(w[1]) if len(w) > 1
            else jnp.zeros((w[0].shape[-1],), jnp.float32),
        }
    return {"params": params}


def load_keras_cae(path: str):
    """Load a real reference `.keras`/`.h5` autoencoder and return
    (CAE module, flax variables) — the import half of the artifact contract
    (improved_detection.py:28-31)."""
    keras = _require_keras()
    from cell_image_analysis_tpu.models.cae import CAE

    km = keras.models.load_model(path, compile=False)
    variables = cae_variables_from_keras(km)
    n_enc = sum(1 for k in variables["params"] if k.startswith("BatchNorm")) // 2
    convs = _natural([k for k in variables["params"] if k.startswith("Conv_")])
    enc_f = tuple(int(np.asarray(variables["params"][k]["kernel"]).shape[-1])
                  for k in convs[:n_enc])
    dec_f = tuple(int(np.asarray(variables["params"][k]["kernel"]).shape[-1])
                  for k in convs[n_enc:-1])
    return CAE(encoder_filters=enc_f, decoder_filters=dec_f), variables


def export_keras_cae(model, variables: dict, path: str) -> None:
    """Write this framework's CAE as a genuine Keras `.keras` file the
    reference's `load_trained_models` (improved_detection.py:28-31) can
    read."""
    _require_keras()
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    autoencoder, _ = build_keras_cae(
        encoder_filters=tuple(model.encoder_filters),
        decoder_filters=tuple(model.decoder_filters),
    )
    convs = _ordered_layers(autoencoder, "Conv2D")
    bns = _ordered_layers(autoencoder, "BatchNormalization")
    for i, layer in enumerate(convs):
        p = params[f"Conv_{i}"]
        layer.set_weights([np.asarray(p["kernel"]), np.asarray(p["bias"])])
    for i, layer in enumerate(bns):
        p = params[f"BatchNorm_{i}"]
        s = stats[f"BatchNorm_{i}"]
        layer.set_weights([np.asarray(p["scale"]), np.asarray(p["bias"]),
                           np.asarray(s["mean"]), np.asarray(s["var"])])
    autoencoder.save(path)


def keras_unet_from_variables(variables: dict, input_size: int = 256,
                              **arch_kw):
    """Build the Keras twin U-Net and load this framework's flax weights into
    it — used by the StarDist CPU reference baseline so the CPU (TF) and TPU
    paths run the identical network."""
    _require_keras()
    from cell_image_analysis_tpu.utils.port_weights import _natural_key

    km = build_keras_stardist_unet(input_size=input_size, **arch_kw)
    convs = _ordered_layers(km, "Conv2D")
    params = variables["params"]
    names = sorted((k for k in params if k.startswith("Conv_")), key=_natural_key)
    if len(names) != len(convs):
        raise ValueError(f"layer count mismatch: flax {len(names)} vs keras {len(convs)}")
    for name, layer in zip(names, convs):
        p = params[name]
        layer.set_weights([np.asarray(p["kernel"]), np.asarray(p["bias"])])
    return km


# ---------------------------------------------------------------------------
# sklearn estimator -> this framework's estimators
# ---------------------------------------------------------------------------

def convert_sklearn_scaler(sk) -> "Any":
    """sklearn.preprocessing.RobustScaler -> models/scaler.RobustScaler."""
    from cell_image_analysis_tpu.models.scaler import RobustScaler

    out = RobustScaler()
    out.center_ = np.asarray(sk.center_, np.float32)
    out.scale_ = np.asarray(sk.scale_, np.float32)
    return out


def convert_sklearn_pca(sk) -> "Any":
    """sklearn.decomposition.PCA -> models/pca.PCA."""
    from cell_image_analysis_tpu.models.pca import PCA

    out = PCA(n_components=int(sk.n_components_))
    out.mean_ = np.asarray(sk.mean_, np.float32)
    out.components_ = np.asarray(sk.components_, np.float32)
    out.explained_variance_ = np.asarray(sk.explained_variance_, np.float32)
    out.explained_variance_ratio_ = np.asarray(
        sk.explained_variance_ratio_, np.float32
    )
    return out


def convert_sklearn_ocsvm(sk) -> "Any":
    """sklearn.svm.OneClassSVM (fitted, rbf kernel) -> models/svm.OneClassSVM.

    libsvm's decision function is sum_i alpha_i k(x, sv_i) - rho with
    dual_coef_ = alpha (shape (1, K)) and intercept_ = -rho — identical to
    this framework's convention, so parameters copy verbatim."""
    from cell_image_analysis_tpu.models.svm import OneClassSVM

    if getattr(sk, "kernel", "rbf") != "rbf":
        raise ValueError(f"only rbf OneClassSVM is supported, got {sk.kernel!r}")
    out = OneClassSVM(nu=float(getattr(sk, "nu", 0.5)))
    out.support_vectors_ = np.asarray(sk.support_vectors_, np.float32)
    out.dual_coef_ = np.asarray(sk.dual_coef_, np.float32).reshape(-1)
    out.intercept_ = float(np.asarray(sk.intercept_).reshape(-1)[0])
    out.gamma_ = float(getattr(sk, "_gamma", getattr(sk, "gamma_", 0.0)))
    if out.gamma_ == 0.0:
        raise ValueError("could not recover fitted gamma from sklearn model")
    return out


# ---------------------------------------------------------------------------
# Format sniffing + conversion (used by io/artifacts.load_screening_artifacts,
# the single directory-level loader — reference: improved_detection.py:23-46)
# ---------------------------------------------------------------------------

def _is_keras_file(path: str) -> bool:
    with open(path, "rb") as f:
        magic = f.read(4)
    return magic[:2] == b"PK" or magic == b"\x89HDF"


def _maybe_convert(obj):
    mod = type(obj).__module__ or ""
    if mod.startswith("sklearn"):
        name = type(obj).__name__
        if name == "RobustScaler":
            return convert_sklearn_scaler(obj)
        if name == "PCA":
            return convert_sklearn_pca(obj)
        if name == "OneClassSVM":
            return convert_sklearn_ocsvm(obj)
        raise ValueError(f"unsupported sklearn artifact: {name}")
    return obj
