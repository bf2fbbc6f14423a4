#!/usr/bin/env python
"""Per-level cumulative timing of the StarDist U-Net s2d forward on TPU.

probe_stardist shows the U-Net forward at ~47 ms device per 8x1024^2 batch —
now the largest single term of the StarDist screening path.  This cuts the
forward after each level to locate the cost (FLOP estimate says the two
decoder blocks are ~44% and the s2d level 0 ~23%, but measure first).

Usage: python scripts/probe_unet.py [batch] [size]
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

from cell_image_analysis_tpu.models.unet import _s2d, _s2d_kernel
from cell_image_analysis_tpu.utils.bench import load_synthetic_unet_variables

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

variables = load_synthetic_unet_variables()
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


def forward(x, stop):
    f = 32
    h = _s2d(x)
    h = nn.relu(conv(h, "Conv_0", _s2d_kernel(p["Conv_0"]["kernel"]),
                     jnp.tile(p["Conv_0"]["bias"], 4)))
    h = nn.relu(conv(h, "Conv_1", _s2d_kernel(p["Conv_1"]["kernel"]),
                     jnp.tile(p["Conv_1"]["bias"], 4)))
    b_, hh, ww, _ = h.shape
    h = h.reshape(b_, hh, ww, 2, 2, f).max(axis=(3, 4))
    if stop == 0:
        return h
    h = nn.relu(conv(h, "Conv_2")); h = nn.relu(conv(h, "Conv_3")); skip1 = h
    h = pool(h)
    if stop == 1:
        return h
    h = nn.relu(conv(h, "Conv_4")); h = nn.relu(conv(h, "Conv_5")); skip2 = h
    h = pool(h)
    if stop == 2:
        return h
    h = nn.relu(conv(h, "Conv_6")); h = nn.relu(conv(h, "Conv_7"))
    if stop == 3:
        return h
    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
    h = jnp.concatenate([h[:, : skip2.shape[1], : skip2.shape[2]], skip2], axis=-1)
    h = nn.relu(conv(h, "Conv_8")); h = nn.relu(conv(h, "Conv_9"))
    if stop == 4:
        return h
    h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
    h = jnp.concatenate([h[:, : skip1.shape[1], : skip1.shape[2]], skip1], axis=-1)
    h = nn.relu(conv(h, "Conv_10")); h = nn.relu(conv(h, "Conv_11"))
    if stop == 5:
        return h
    feat = nn.relu(conv(h, "Conv_12"))
    if stop == 6:
        return feat
    prob = nn.sigmoid(conv(feat, "Conv_13"))[..., 0]
    dist = nn.softplus(conv(feat, "Conv_14"))
    return prob + dist.sum(-1)


STAGES = [
    (0, "s2d level 0 + pool   "),
    (1, "+ enc L1 (512^2,64)  "),
    (2, "+ enc L2 (256^2,128) "),
    (3, "+ mid    (128^2,256) "),
    (4, "+ dec L2 (256^2,128) "),
    (5, "+ dec L1 (512^2,64)  "),
    (6, "+ head conv (128)    "),
    (7, "+ 1x1 heads          "),
]

fns = {s: jax.jit(partial(forward, stop=s)) for s, _ in STAGES}


def t(name, fn, reps=3):
    fn()
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{name}: {best*1e3:8.1f} ms", flush=True)


print(f"probe_unet: batch={BATCH} size={SIZE}", flush=True)
for s, name in STAGES:
    t(name, lambda s=s: float(fns[s](x).sum()))
