#!/usr/bin/env python
"""Same-process A/B of the U-Net decoder tail: standard layout (repeat +
concat + 64-channel convs at H/2) vs s2d layout (phase/up-kernel convs at
H/4).  Interleaved best-of-5 to cancel tunnel drift.

Usage: python scripts/probe_unet_ab.py [batch] [size]
"""
import sys, time

sys.path.insert(0, ".")
from cell_image_analysis_tpu.utils import jaxcache

jaxcache.enable()

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from cell_image_analysis_tpu.models.unet import (
    StarDistUNet,
    _d2s,
    _s2d,
    _s2d_kernel,
    _s2d_kernel_1x1,
    _up_kernel,
    apply_unet_s2d,
)
from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

variables = load_synthetic_unet_variables()
model = StarDistUNet()
p = variables["params"]
dn = ("NHWC", "HWIO", "NHWC")
rng = np.random.default_rng(0)
x = jnp.asarray(rng.uniform(size=(BATCH, SIZE, SIZE, 1)).astype(np.float32))


def conv(h, name, kernel=None, bias=None):
    W = p[name]["kernel"] if kernel is None else kernel
    b = p[name]["bias"] if bias is None else bias
    y = jax.lax.conv_general_dilated(h, W, (1, 1), "SAME", dimension_numbers=dn)
    return y + b


def pool(h):
    return nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")


def trunk(x):
    """Shared encoder + dec L2 (s2d level 0, as in apply_unet_s2d)."""
    from cell_image_analysis_tpu.models.unet import _s2d_kernel as sk
    f = 32
    h = _s2d(x)
    h = nn.relu(conv(h, "Conv_0", sk(p["Conv_0"]["kernel"]),
                     jnp.tile(p["Conv_0"]["bias"], 4)))
    h = nn.relu(conv(h, "Conv_1", sk(p["Conv_1"]["kernel"]),
                     jnp.tile(p["Conv_1"]["bias"], 4)))
    b_, hh, ww, _ = h.shape
    h = h.reshape(b_, hh, ww, 2, 2, f).max(axis=(3, 4))
    h = nn.relu(conv(h, "Conv_2")); h = nn.relu(conv(h, "Conv_3")); skip1 = h
    h = pool(h)
    h = nn.relu(conv(h, "Conv_4")); h = nn.relu(conv(h, "Conv_5")); skip2 = h
    h = pool(h)
    h = nn.relu(conv(h, "Conv_6")); h = nn.relu(conv(h, "Conv_7"))
    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
    h = jnp.concatenate([h, skip2], axis=-1)
    h = nn.relu(conv(h, "Conv_8")); h = nn.relu(conv(h, "Conv_9"))
    return h, skip1


@jax.jit
def fwd_std(x):
    h, skip1 = trunk(x)
    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
    h = jnp.concatenate([h, skip1], axis=-1)
    h = nn.relu(conv(h, "Conv_10")); h = nn.relu(conv(h, "Conv_11"))
    feat = nn.relu(conv(h, "Conv_12"))
    prob = nn.sigmoid(conv(feat, "Conv_13"))[..., 0]
    dist = nn.softplus(conv(feat, "Conv_14"))
    return prob.sum() + dist.sum()


@jax.jit
def fwd_s2d(x):
    h, skip1 = trunk(x)
    W10 = p["Conv_10"]["kernel"]
    up = conv(h, "", _up_kernel(W10[:, :, : h.shape[-1], :]),
              jnp.tile(p["Conv_10"]["bias"], 4))
    sk = conv(_s2d(skip1), "", _s2d_kernel(W10[:, :, h.shape[-1]:, :]),
              jnp.zeros((), W10.dtype))
    h = nn.relu(up + sk)
    h = nn.relu(conv(h, "Conv_11", _s2d_kernel(p["Conv_11"]["kernel"]),
                     jnp.tile(p["Conv_11"]["bias"], 4)))
    feat = nn.relu(conv(h, "Conv_12", _s2d_kernel(p["Conv_12"]["kernel"]),
                        jnp.tile(p["Conv_12"]["bias"], 4)))
    prob = nn.sigmoid(_d2s(conv(feat, "Conv_13",
                                _s2d_kernel_1x1(p["Conv_13"]["kernel"]),
                                jnp.tile(p["Conv_13"]["bias"], 4))))[..., 0]
    dist = _d2s(nn.softplus(conv(feat, "Conv_14",
                                 _s2d_kernel_1x1(p["Conv_14"]["kernel"]),
                                 jnp.tile(p["Conv_14"]["bias"], 4))))
    return prob.sum() + dist.sum()


@jax.jit
def fwd_s2d_nod2s(x):
    """s2d decoder WITHOUT the d2s relayout — bounds the d2s transpose cost
    (consumers could read s2d-layout heads directly)."""
    h, skip1 = trunk(x)
    W10 = p["Conv_10"]["kernel"]
    up = conv(h, "", _up_kernel(W10[:, :, : h.shape[-1], :]),
              jnp.tile(p["Conv_10"]["bias"], 4))
    sk = conv(_s2d(skip1), "", _s2d_kernel(W10[:, :, h.shape[-1]:, :]),
              jnp.zeros((), W10.dtype))
    h = nn.relu(up + sk)
    h = nn.relu(conv(h, "Conv_11", _s2d_kernel(p["Conv_11"]["kernel"]),
                     jnp.tile(p["Conv_11"]["bias"], 4)))
    feat = nn.relu(conv(h, "Conv_12", _s2d_kernel(p["Conv_12"]["kernel"]),
                        jnp.tile(p["Conv_12"]["bias"], 4)))
    prob = nn.sigmoid(conv(feat, "Conv_13",
                           _s2d_kernel_1x1(p["Conv_13"]["kernel"]),
                           jnp.tile(p["Conv_13"]["bias"], 4)))
    dist = nn.softplus(conv(feat, "Conv_14",
                            _s2d_kernel_1x1(p["Conv_14"]["kernel"]),
                            jnp.tile(p["Conv_14"]["bias"], 4)))
    return prob.sum() + dist.sum()


@jax.jit
def fwd_hybrid(x):
    """Phase-kernel up-conv at H/4 (same FLOPs as the standard conv3x3 over
    the upsample — the tap structure is exactly 1/4-dense), d2s back to
    standard layout before Conv_11: avoids materializing the 512^2 x 192
    upsample+concat tensor WITHOUT the 4x FLOP blowup of the full-s2d tail
    (s2d 3x3 kernels are 75% zero blocks the MXU still multiplies)."""
    h, skip1 = trunk(x)
    W10 = p["Conv_10"]["kernel"]
    up = conv(h, "", _up_kernel(W10[:, :, : h.shape[-1], :]),
              jnp.tile(p["Conv_10"]["bias"], 4))        # (B, H/4, W/4, 4*64)
    sk = conv(skip1, "", W10[:, :, h.shape[-1]:, :],
              jnp.zeros((), W10.dtype))                 # (B, H/2, W/2, 64)
    h = nn.relu(_d2s(up) + sk)
    h = nn.relu(conv(h, "Conv_11"))
    feat = nn.relu(conv(h, "Conv_12"))
    prob = nn.sigmoid(conv(feat, "Conv_13"))[..., 0]
    dist = nn.softplus(conv(feat, "Conv_14"))
    return prob.sum() + dist.sum()


def trunk_hybrid(x):
    """Encoder (s2d level 0) + HYBRID dec L2: up-conv phase kernels at H/8,
    d2s, + skip conv — avoids the (H/4)^2 x 384 upsample+concat tensor."""
    from cell_image_analysis_tpu.models.unet import _s2d_kernel as sk
    f = 32
    h = _s2d(x)
    h = nn.relu(conv(h, "Conv_0", sk(p["Conv_0"]["kernel"]),
                     jnp.tile(p["Conv_0"]["bias"], 4)))
    h = nn.relu(conv(h, "Conv_1", sk(p["Conv_1"]["kernel"]),
                     jnp.tile(p["Conv_1"]["bias"], 4)))
    b_, hh, ww, _ = h.shape
    h = h.reshape(b_, hh, ww, 2, 2, f).max(axis=(3, 4))
    h = nn.relu(conv(h, "Conv_2")); h = nn.relu(conv(h, "Conv_3")); skip1 = h
    h = pool(h)
    h = nn.relu(conv(h, "Conv_4")); h = nn.relu(conv(h, "Conv_5")); skip2 = h
    h = pool(h)
    h = nn.relu(conv(h, "Conv_6")); h = nn.relu(conv(h, "Conv_7"))
    W8 = p["Conv_8"]["kernel"]
    up = conv(h, "", _up_kernel(W8[:, :, : h.shape[-1], :]),
              jnp.tile(p["Conv_8"]["bias"], 4))
    sk8 = conv(skip2, "", W8[:, :, h.shape[-1]:, :], jnp.zeros((), W8.dtype))
    h = nn.relu(_d2s(up) + sk8)
    h = nn.relu(conv(h, "Conv_9"))
    return h, skip1


@jax.jit
def fwd_hybrid2(x):
    """Hybrid up-conv at BOTH decoder levels."""
    h, skip1 = trunk_hybrid(x)
    W10 = p["Conv_10"]["kernel"]
    up = conv(h, "", _up_kernel(W10[:, :, : h.shape[-1], :]),
              jnp.tile(p["Conv_10"]["bias"], 4))
    sk = conv(skip1, "", W10[:, :, h.shape[-1]:, :], jnp.zeros((), W10.dtype))
    h = nn.relu(_d2s(up) + sk)
    h = nn.relu(conv(h, "Conv_11"))
    feat = nn.relu(conv(h, "Conv_12"))
    prob = nn.sigmoid(conv(feat, "Conv_13"))[..., 0]
    dist = nn.softplus(conv(feat, "Conv_14"))
    return prob.sum() + dist.sum()


FNS = [("std decoder ", fwd_std), ("s2d decoder ", fwd_s2d),
       ("s2d no-d2s  ", fwd_s2d_nod2s), ("hybrid up   ", fwd_hybrid),
       ("hybrid both ", fwd_hybrid2)]

print(f"probe_unet_ab: batch={BATCH} size={SIZE}", flush=True)
for name, fn in FNS:  # compile
    float(fn(x))
best = {name: 1e9 for name, _ in FNS}
for _ in range(5):
    for name, fn in FNS:
        t0 = time.perf_counter()
        float(fn(x))
        best[name] = min(best[name], time.perf_counter() - t0)
for name, _ in FNS:
    print(f"{name}: {best[name]*1e3:8.1f} ms", flush=True)
