"""StarDist-style 2D U-Net with probability + radial-distance heads.

Architecture contract from the reference's pretrained `2D_versatile_fluo`
(SURVEY.md section 2.2.3; call sites CAE_improved_modeltrain.py:118,
improved_detection.py:44): U-Net depth 3, 32 base filters, 3x3 kernels, two
convs per level, 128-channel conv head, two 1x1 heads — object probability
(sigmoid) and 32 radial distances — at grid=(2,2) output stride.  The grid
stride is realized by stopping the decoder one level above full resolution,
so the heads see H/2 x W/2 features.

No pretrained weights can be downloaded in this environment; the framework
instead provides in-framework training (train/unet_trainer.py) on labeled or
synthetic data, plus a weight-port utility for externally converted
checkpoints (io/artifacts.save_cae works for any flax variables pytree).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


class StarDistUNet(nn.Module):
    n_rays: int = 32
    depth: int = 3
    base_filters: int = 32
    head_filters: int = 128
    grid: Tuple[int, int] = (2, 2)
    # compute dtype for the conv stack (params stay f32).  bfloat16 halves
    # the HBM activation footprint (the f32 level-0 activation pads 4x under
    # T(8,128) with 32 channels — it OOMs a 16-frame 1024^2 batch) and feeds
    # the MXU at 2x; heads are computed in f32.  Screening parity: prob
    # deviates ~1e-3 from the f32 forward, which only flips candidates
    # sitting that close to prob_thresh.
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        cdt = jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32
        conv = partial(nn.Conv, kernel_size=(3, 3), padding="SAME",
                       dtype=cdt,
                       kernel_init=jax.nn.initializers.glorot_uniform())

        def block(h, f):
            h = nn.relu(conv(features=f)(h))
            h = nn.relu(conv(features=f)(h))
            return h

        skips = []
        h = x
        for lvl in range(self.depth):
            h = block(h, self.base_filters * (2 ** lvl))
            skips.append(h)
            h = nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")
        h = block(h, self.base_filters * (2 ** self.depth))

        # decoder: stop `log2(grid)` levels above full resolution
        import math

        stop = int(math.log2(self.grid[0]))
        for lvl in reversed(range(stop, self.depth)):
            b, hh, ww, c = h.shape
            h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
            skip = skips[lvl]
            h = jnp.concatenate([h[:, : skip.shape[1], : skip.shape[2]], skip], axis=-1)
            h = block(h, self.base_filters * (2 ** lvl))

        feat = nn.relu(conv(features=self.head_filters)(h))
        feat = feat.astype(jnp.float32)
        prob = nn.sigmoid(nn.Conv(1, (1, 1))(feat))[..., 0]          # (B, H/g, W/g)
        dist = nn.softplus(nn.Conv(self.n_rays, (1, 1))(feat))       # (B, H/g, W/g, R)
        return prob, dist


def _s2d(x: jax.Array) -> jax.Array:
    """Space-to-depth factor 2: (B, H, W, C) -> (B, H/2, W/2, 4C) with
    channel layout (row-subpixel, col-subpixel, C)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)


def _s2d_kernel(W: jax.Array) -> jax.Array:
    """Transform a 3x3 stride-1 SAME correlation kernel (3, 3, Ci, Co) into
    the equivalent kernel (3, 3, 4Ci, 4Co) over space-to-depth inputs.

    For output subpixel a and kernel row u, the original tap offset
    s = a + u - 1 lands in transformed block row P = s // 2 + 1 at input
    subpixel row c = s % 2 (floor semantics; borders map to the SAME-padded
    zero block exactly as the original zero padding).  Channel layouts match
    `_s2d`.  Exact up to f32 summation reassociation in the conv."""
    kh, kw, Ci, Co = W.shape
    assert (kh, kw) == (3, 3)
    Wp = jnp.zeros((3, 3, 4 * Ci, 4 * Co), W.dtype)
    for a in range(2):
        for u in range(3):
            s = a + u - 1
            P, c = s // 2 + 1, s % 2
            for b in range(2):
                for v in range(3):
                    t = b + v - 1
                    Q, d = t // 2 + 1, t % 2
                    Wp = Wp.at[
                        P, Q,
                        (c * 2 + d) * Ci:(c * 2 + d + 1) * Ci,
                        (a * 2 + b) * Co:(a * 2 + b + 1) * Co,
                    ].set(W[u, v])
    return Wp


def apply_unet_s2d(model: StarDistUNet, variables: dict, x: jax.Array,
                   train: bool = False):
    """Fast functional forward for grid=(2,2): level 0 is computed in
    space-to-depth layout so the (B, H, W, 32) float32 activation — which
    pads 4x under the TPU's T(8, 128) tiling and is never consumed as a skip
    (the decoder stops one level above full resolution) — becomes an
    unpadded (B, H/2, W/2, 128) tensor.  conv3x3(1->32), conv3x3(32->32) and
    the 2x2 maxpool are rewritten as conv3x3(4->128), conv3x3(128->128) and
    a channel-group max; identical math up to f32 reassociation (the MXU
    time is unchanged — the rewrite trades the padded lanes for real work —
    but level-0 HBM traffic drops ~4x).

    Reads the exact `StarDistUNet.init` param pytree (Conv_0..Conv_14);
    parity vs `model.apply` is tested in tests/test_unet_s2d.py."""
    assert model.grid == (2, 2) and model.depth == 3, "s2d path: grid (2,2)/depth 3"
    p = variables["params"]
    cdt = jnp.bfloat16 if model.dtype == "bfloat16" else jnp.float32
    dn = ("NHWC", "HWIO", "NHWC")

    def conv(h, name, kernel=None, bias=None):
        W = p[name]["kernel"] if kernel is None else kernel
        b = p[name]["bias"] if bias is None else bias
        y = jax.lax.conv_general_dilated(
            h.astype(cdt), W.astype(cdt), (1, 1), "SAME", dimension_numbers=dn
        )
        return y + b.astype(cdt)

    def pool(h):
        return nn.max_pool(h, (2, 2), strides=(2, 2), padding="SAME")

    f = model.base_filters
    # level 0, space-to-depth
    h = _s2d(x)
    h = nn.relu(conv(h, "Conv_0", _s2d_kernel(p["Conv_0"]["kernel"]),
                     jnp.tile(p["Conv_0"]["bias"], 4)))
    h = nn.relu(conv(h, "Conv_1", _s2d_kernel(p["Conv_1"]["kernel"]),
                     jnp.tile(p["Conv_1"]["bias"], 4)))
    b_, hh, ww, _ = h.shape
    h = h.reshape(b_, hh, ww, 2, 2, f).max(axis=(3, 4))  # == maxpool(level-0)

    # encoder levels 1..2 + middle (standard layout)
    h = nn.relu(conv(h, "Conv_2")); h = nn.relu(conv(h, "Conv_3")); skip1 = h
    h = pool(h)
    h = nn.relu(conv(h, "Conv_4")); h = nn.relu(conv(h, "Conv_5")); skip2 = h
    h = pool(h)
    h = nn.relu(conv(h, "Conv_6")); h = nn.relu(conv(h, "Conv_7"))

    # decoder: levels 2, 1 (stop one above full res = grid (2,2))
    for skip, c1, c2 in ((skip2, "Conv_8", "Conv_9"), (skip1, "Conv_10", "Conv_11")):
        h = jnp.repeat(jnp.repeat(h, 2, axis=1), 2, axis=2)
        h = jnp.concatenate([h[:, : skip.shape[1], : skip.shape[2]], skip], axis=-1)
        h = nn.relu(conv(h, c1)); h = nn.relu(conv(h, c2))

    feat = nn.relu(conv(h, "Conv_12")).astype(jnp.float32)
    prob = nn.sigmoid(
        jax.lax.conv_general_dilated(feat, p["Conv_13"]["kernel"], (1, 1), "SAME",
                                     dimension_numbers=dn) + p["Conv_13"]["bias"]
    )[..., 0]
    dist = nn.softplus(
        jax.lax.conv_general_dilated(feat, p["Conv_14"]["kernel"], (1, 1), "SAME",
                                     dimension_numbers=dn) + p["Conv_14"]["bias"]
    )
    return prob, dist


def unet_apply(model: StarDistUNet, variables: dict, x: jax.Array,
               train: bool = False):
    """Dispatch: the s2d fast path when its preconditions hold, else the
    flax module."""
    if (not train and model.grid == (2, 2) and model.depth == 3
            and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
            and x.shape[3] == 1):
        return apply_unet_s2d(model, variables, x, train=train)
    return model.apply(variables, x, train=train)


def init_unet(key: jax.Array, size: int = 256, **kw) -> tuple[StarDistUNet, dict]:
    model = StarDistUNet(**kw)
    variables = model.init(key, jnp.zeros((1, size, size, 1), jnp.float32), train=False)
    return model, variables


@partial(jax.jit, static_argnames=("model",))
def unet_forward(model: StarDistUNet, variables: dict, x: jax.Array):
    return unet_apply(model, variables, x, train=False)
